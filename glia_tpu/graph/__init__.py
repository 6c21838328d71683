from .merge import apply_merge_order, greedy_merge_order
from .rag import Rag, build_rag
from .tree import MergeTree, build_tree, gen_merge_paths, node_potentials
