// Golden-output generator driving the ACTUAL reference headers.
//
// This file is OUR code; it only #includes headers from /root/reference
// (passed via -I at build time, see tests/test_reference_golden.py) and
// drives them with test inputs, so glia_tpu's reimplementations can be
// checked against the reference's compiled behavior instead of our own
// oracles (breaking the round-1 "circular parity" weakness).
//
// Headers exercised (all std+omp only -- no ITK/Boost/Eigen needed):
//   util/stats.hxx      amedian, histc, entropy, pairStats, randIndex,
//                       precision, recall, f1
//   type/tree.hxx       TTree construction/traversals (via tree_build)
//   hmt/tree_build.hxx  genTree, genOrder, genTreeWithNodePotentials,
//                       collectSubKeys, genMergePaths (both), genNodePaths
//   hmt/tree_greedy.hxx resolveTreeGreedy single-tree, multi-tree
//                       consensus, and subset-inclusion variants
//   hmt/tree_ccm.hxx    computeEnergyTuples, resolveFactorTree,
//                       computeFactorNodeEnergy{Positive,Negative},
//                       computeFactorTreeFullLabelEnergy,
//                       computeFactorNodeMarginalEnergy
//
// Protocol: reads commands from stdin (first token = command), writes one
// result block per command to stdout; "end" terminates.  All numbers are
// printed with %.17g so doubles round-trip exactly.

#include <cstdio>
#include <cinttypes>
// newer libstdc++ no longer includes <cmath> transitively; the reference
// headers assume it (std::fabs etc.), so pull it in before them
#include <cmath>

#include "util/stats.hxx"
#include "util/text_io.hxx"
#include "type/hash.hxx"
#include "type/tree.hxx"
#include "type/tuple.hxx"
#include "hmt/tree_build.hxx"
#include "hmt/tree_greedy.hxx"
#include "hmt/tree_ccm.hxx"

using namespace glia;

struct NodeData {
  Label label = 0;
  double potential = 0.0;
  double Em = 0.0, Es = 0.0;
  friend std::ostream& operator<< (std::ostream& os, NodeData const& d)
  { return os << d.label; }
  friend std::istream& operator>> (std::istream& is, NodeData& d)
  { return is >> d.label; }
};

typedef TTree<NodeData> Tree;
typedef TTriple<Label> Merge;

static std::vector<Merge> readOrder (int n) {
  std::vector<Merge> order(n);
  for (auto& m : order) { std::scanf("%u %u %u", &m.x0, &m.x1, &m.x2); }
  return order;
}

static Tree buildTree (std::vector<Merge> const& order) {
  Tree tree;
  hmt::genTree(tree, order,
               [](Tree::Node& node, Label r) { node.data.label = r; });
  return tree;
}

static void printTree (Tree const& tree) {
  std::printf("%d\n", (int)tree.size());
  for (auto const& node : tree) {
    std::printf("%d %d %u", node.self, node.parent, node.data.label);
    std::printf(" %d", (int)node.children.size());
    for (auto c : node.children) { std::printf(" %d", c); }
    std::printf("\n");
  }
  std::printf("root %d\n", tree.root());
}

int main () {
  char cmd[64];
  while (std::scanf("%63s", cmd) == 1) {
    std::string c(cmd);
    if (c == "end") { break; }
    if (c == "amedian") {
      int n; std::scanf("%d", &n);
      std::vector<double> v(n);
      for (auto& x : v) { std::scanf("%lf", &x); }
      std::printf("%.17g\n", stats::amedian(v));
    } else if (c == "histc") {
      int n, bin; double lo, hi;
      std::scanf("%d %d %lf %lf", &n, &bin, &lo, &hi);
      std::vector<double> v(n);
      for (auto& x : v) { std::scanf("%lf", &x); }
      std::vector<glia::uint> hc;
      stats::histc(hc, v, bin, std::make_pair(lo, hi));
      for (auto x : hc) { std::printf("%zu ", (size_t)x); }
      std::printf("\n");
    } else if (c == "entropy") {
      int n; std::scanf("%d", &n);
      std::vector<double> v(n);
      for (auto& x : v) { std::scanf("%lf", &x); }
      std::printf("%.17g\n", stats::entropy(v));
    } else if (c == "pairstats") {
      // nc (k0 k1 cnt)*nc ne0 keys ne1 keys
      int nc; std::scanf("%d", &nc);
      std::unordered_map<std::pair<Label, Label>, long long> cmap;
      for (int i = 0; i < nc; ++i) {
        Label k0, k1; long long cnt;
        std::scanf("%u %u %lld", &k0, &k1, &cnt);
        cmap[std::make_pair(k0, k1)] += cnt;
      }
      std::unordered_set<Label> exc0, exc1;
      int ne; std::scanf("%d", &ne);
      for (int i = 0; i < ne; ++i) { Label k; std::scanf("%u", &k); exc0.insert(k); }
      std::scanf("%d", &ne);
      for (int i = 0; i < ne; ++i) { Label k; std::scanf("%u", &k); exc1.insert(k); }
      long long tp, tn, fp, fn;
      stats::pairStats(tp, tn, fp, fn, cmap, exc0, exc1);
      double ri, prec, rec, f;
      stats::randIndex(ri, tp, tn, fp, fn);
      stats::precision(prec, tp, fp);
      stats::recall(rec, tp, fn);
      stats::f1(f, prec, rec);
      std::printf("%lld %lld %lld %lld %.17g %.17g %.17g %.17g\n",
                  tp, tn, fp, fn, ri, prec, rec, f);
    } else if (c == "tree") {
      int n; std::scanf("%d", &n);
      auto order = readOrder(n);
      auto tree = buildTree(order);
      printTree(tree);
      // genOrder round trip
      std::vector<Merge> order2;
      hmt::genOrder<Tree, Label>(order2, tree);
      std::printf("order %d\n", (int)order2.size());
      for (auto const& m : order2)
      { std::printf("%u %u %u\n", m.x0, m.x1, m.x2); }
      // collectSubKeys (sorted)
      std::vector<std::vector<Label>> subKeys;
      hmt::collectSubKeys(subKeys, tree,
                          [](Tree::Node const& node)
                          { return node.data.label; }, true);
      std::printf("subkeys %d\n", (int)subKeys.size());
      for (auto const& sk : subKeys) {
        std::printf("%d", (int)sk.size());
        for (auto k : sk) { std::printf(" %u", k); }
        std::printf("\n");
      }
    } else if (c == "potentials") {
      int n; std::scanf("%d", &n);
      auto order = readOrder(n);
      std::vector<double> mp(n);
      for (auto& x : mp) { std::scanf("%lf", &x); }
      Tree tree;
      auto it = mp.cbegin();
      hmt::genTreeWithNodePotentials<Tree, Label>(tree, order, it);
      std::printf("%d\n", (int)tree.size());
      for (auto const& node : tree)
      { std::printf("%u %.17g\n", node.data.label, node.data.potential); }
    } else if (c == "mergepaths") {
      // n triples pathLength minPathLength   (pathLength<0 => unbounded)
      int n; std::scanf("%d", &n);
      auto order = readOrder(n);
      int pl, mpl; std::scanf("%d %d", &pl, &mpl);
      std::vector<std::vector<int>> paths;
      if (pl < 0) { hmt::genMergePaths(paths, order); }
      else { hmt::genMergePaths(paths, order, pl, mpl); }
      std::printf("%d\n", (int)paths.size());
      for (auto const& p : paths) {
        std::printf("%d", (int)p.size());
        for (auto i : p) { std::printf(" %d", i); }
        std::printf("\n");
      }
    } else if (c == "nodepaths") {
      int n; std::scanf("%d", &n);
      auto order = readOrder(n);
      auto tree = buildTree(order);
      std::vector<std::vector<int>> paths;
      hmt::genNodePaths(paths, tree);
      std::printf("%d\n", (int)paths.size());
      for (auto const& p : paths) {
        std::printf("%d", (int)p.size());
        for (auto i : p) { std::printf(" %d", i); }
        std::printf("\n");
      }
    } else if (c == "greedy1") {
      // n triples M pots
      int n; std::scanf("%d", &n);
      auto order = readOrder(n);
      auto tree = buildTree(order);
      int m; std::scanf("%d", &m);
      for (int i = 0; i < m; ++i)
      { std::scanf("%lf", &tree[i].data.potential); }
      std::vector<int> picks;
      hmt::resolveTreeGreedy(
          picks, tree, [](Tree::Node const&) { return true; },
          [](Tree::Node const& a, Tree::Node const& b)
          { return a.data.potential < b.data.potential; });
      std::printf("%d", (int)picks.size());
      for (auto p : picks) { std::printf(" %d", p); }
      std::printf("\n");
    } else if (c == "greedyN" || c == "greedyS") {
      // T then per tree: n triples M pots
      int T; std::scanf("%d", &T);
      std::vector<Tree> trees(T);
      for (int t = 0; t < T; ++t) {
        int n; std::scanf("%d", &n);
        auto order = readOrder(n);
        trees[t] = buildTree(order);
        int m; std::scanf("%d", &m);
        for (int i = 0; i < m; ++i)
        { std::scanf("%lf", &trees[t][i].data.potential); }
      }
      auto comp = [](Tree::Node const& a, Tree::Node const& b)
      { return a.data.potential < b.data.potential; };
      if (c == "greedyN") {
        std::vector<std::pair<int, int>> picks;
        hmt::resolveTreeGreedy(picks, trees, comp);
        std::printf("%d\n", (int)picks.size());
        for (auto const& p : picks)
        { std::printf("%d %d\n", p.first, p.second); }
      } else {
        std::vector<std::vector<int>> picks;
        hmt::resolveTreeGreedy(picks, trees, comp);
        std::printf("%d\n", (int)picks.size());
        for (auto const& pk : picks) {
          std::printf("%d", (int)pk.size());
          for (auto p : pk) { std::printf(" %d", p); }
          std::printf("\n");
        }
      }
    } else if (c == "rescale") {
      // n d outputMin outputMax then n*d doubles: feature min-max rescale
      // (util/stats.hxx:264-318, the pred_mlp preprocessing)
      int n, d; double omin, omax;
      std::scanf("%d %d %lf %lf", &n, &d, &omin, &omax);
      std::vector<std::vector<std::vector<FVal>>> feats(1);
      feats[0].resize(n, std::vector<FVal>(d));
      for (auto& row : feats[0])
      { for (auto& x : row) { std::scanf("%lf", &x); } }
      std::vector<std::vector<FVal>> minmax;
      stats::rescale(minmax, feats, omin, omax);
      for (int r = 0; r < 2; ++r) {
        for (auto x : minmax[r]) { std::printf("%.17g ", x); }
        std::printf("\n");
      }
      for (auto const& row : feats[0]) {
        for (auto x : row) { std::printf("%.17g ", x); }
        std::printf("\n");
      }
    } else if (c == "writedata") {
      // n d path then n*d doubles: write a feature matrix with the
      // mains' conventions (writeData(file, rows, " ", "\n", FLT_PREC),
      // main_bc_feat.cxx:108) so glia_tpu's text IO parses real files
      int n, d; char path[512];
      std::scanf("%d %d %511s", &n, &d, path);
      std::vector<std::vector<FVal>> rows(n, std::vector<FVal>(d));
      for (auto& row : rows)
      { for (auto& x : row) { std::scanf("%lf", &x); } }
      writeData(std::string(path), rows, " ", "\n", FLT_PREC);
      std::printf("ok\n");
    } else if (c == "ccm") {
      // n triples then M lines of (Em Es)
      int n; std::scanf("%d", &n);
      auto order = readOrder(n);
      auto tree = buildTree(order);
      int m; std::scanf("%d", &m);
      for (int i = 0; i < m; ++i)
      { std::scanf("%lf %lf", &tree[i].data.Em, &tree[i].data.Es); }
      std::vector<std::pair<double, double>> Ems;
      hmt::computeEnergyTuples(Ems, tree);
      std::printf("%d\n", (int)Ems.size());
      for (auto const& e : Ems)
      { std::printf("%.17g %.17g\n", e.first, e.second); }
      std::vector<int> picks;
      hmt::resolveFactorTree(picks, tree, Ems);
      std::printf("%d", (int)picks.size());
      for (auto p : picks) { std::printf(" %d", p); }
      std::printf("\n");
      for (int i = 0; i < (int)tree.size(); ++i) {
        std::printf("%.17g %.17g\n",
                    hmt::computeFactorNodeEnergyPositive(tree, i, Ems),
                    hmt::computeFactorNodeEnergyNegative(tree, i, Ems));
      }
    } else if (c == "dist") {
      // n then n doubles then n doubles: distL1/distL2/distX2
      // (stats.hxx:155-185, the histogram-diff feature kernels)
      int n; std::scanf("%d", &n);
      std::vector<double> a(n), b(n);
      for (auto& x : a) { std::scanf("%lf", &x); }
      for (auto& x : b) { std::scanf("%lf", &x); }
      std::printf("%.17g %.17g %.17g\n", stats::distL1(a, b),
                  stats::distL2(a, b), stats::distX2(a, b));
    } else if (c == "ccmfull") {
      // n triples then M lines of (Em Es): exponential full-label
      // enumeration (tree_ccm.hxx:124-157) + per-node marginal energies
      // (tree_ccm.hxx:160-190).  Tiny trees only.
      int n; std::scanf("%d", &n);
      auto order = readOrder(n);
      auto tree = buildTree(order);
      int m; std::scanf("%d", &m);
      for (int i = 0; i < m; ++i)
      { std::scanf("%lf %lf", &tree[i].data.Em, &tree[i].data.Es); }
      std::vector<std::pair<double, std::vector<double>>> Ems;
      hmt::computeFactorTreeFullLabelEnergy(Ems, tree);
      std::printf("%d\n", (int)Ems.size());
      for (auto const& e : Ems) {
        std::printf("%.17g %d", e.first, (int)e.second.size());
        for (auto x : e.second) { std::printf(" %.17g", x); }
        std::printf("\n");
      }
      for (int i = 0; i < m; ++i) {
        std::vector<double> marg;
        hmt::computeFactorNodeMarginalEnergy(marg, tree, i, Ems);
        std::printf("%d", (int)marg.size());
        for (auto x : marg) { std::printf(" %.17g", x); }
        std::printf("\n");
      }
    } else {
      std::fprintf(stderr, "unknown command: %s\n", cmd);
      return 2;
    }
    std::fflush(stdout);
  }
  return 0;
}
