// RF legacy-model IO golden tool: drives the ACTUAL reference reader and
// writer (rf_old::readModelFromBinaryFile / writeModelToBinaryFile,
// compiled from /root/reference/code/ml/rf/ml_rf_model.cxx -- linked, not
// copied) so glia_tpu's Python implementation of the format
// (glia_tpu/models/rf_legacy.py) is verified against reference behavior:
//
//   make <out.bin>       write a synthetic model with the reference writer
//   dump <in.bin>        read with the reference reader, print all arrays
//
// Build (see tests/test_rf_legacy.py):
//   g++ -std=c++14 -O2 -I/root/reference/code rf_io_golden.cc \
//       /root/reference/code/ml/rf/ml_rf_model.cxx -o rf_io_golden

#include <cmath>
#include <cstdio>
#include <cstring>

#include "ml/rf/ml_rf.h"

using rf_old::Model;

template <typename T>
static T* copyArr (std::vector<T> const& v) {
  T* p = new T[v.size()];
  std::memcpy(p, v.data(), sizeof(T) * v.size());
  return p;
}

static void fillSynthetic (Model& m) {
  // 3 trees, nrnodes=101 (payloads > MIN_SPARSE_SIZE=128 where it counts),
  // 2 classes; irregular values incl. many zeros to hit the sparse codec
  int T = 3, nrnodes = 101, C = 2;
  m.nrnodes = nrnodes;
  m.ntree = T;
  m.mtry = 4;
  m.nclass = C;
  std::vector<int> treemap(2 * nrnodes * T, 0), nodestatus(nrnodes * T, 0),
      nodeclass(nrnodes * T, 0), bestvar(nrnodes * T, 0),
      ndbigtree(T, 0);
  std::vector<double> xbestsplit(nrnodes * T, 0.0);
  unsigned rng = 12345;
  auto next = [&rng]() { rng = rng * 1103515245u + 12345u; return rng; };
  for (int t = 0; t < T; ++t) {
    // complete binary tree of depth 4 -> 31 nodes
    int used = 31;
    ndbigtree[t] = used;
    for (int k = 0; k < used; ++k) {
      bool leaf = 2 * k + 2 >= used;
      if (leaf) {
        nodestatus[t * nrnodes + k] = -1;
        nodeclass[t * nrnodes + k] = 1 + (int)(next() % C);
      } else {
        nodestatus[t * nrnodes + k] = 1;
        treemap[2 * t * nrnodes + 2 * k] = 2 * k + 1 + 1;      // 1-based
        treemap[2 * t * nrnodes + 2 * k + 1] = 2 * k + 2 + 1;
        bestvar[t * nrnodes + k] = 1 + (int)(next() % 5);
        xbestsplit[t * nrnodes + k] = (next() % 1000) / 1000.0;
      }
    }
  }
  // the trainer stores TRANSPOSED buffers in the Model
  // (ml_rf_train.cxx:696-717); mirror that so the reference reader's
  // post-read transpose (ml_rf_model.cxx:541-557) recovers the raw layout
  m.treemap = rf_old::transpose(treemap.data(), 2 * T, nrnodes);
  m.n_treemap[0] = nrnodes; m.n_treemap[1] = 2 * T;
  m.nodestatus = rf_old::transpose(nodestatus.data(), T, nrnodes);
  m.n_nodestatus[0] = nrnodes; m.n_nodestatus[1] = T;
  m.nodeclass = rf_old::transpose(nodeclass.data(), T, nrnodes);
  m.n_nodeclass[0] = nrnodes; m.n_nodeclass[1] = T;
  m.bestvar = rf_old::transpose(bestvar.data(), T, nrnodes);
  m.n_bestvar[0] = nrnodes; m.n_bestvar[1] = T;
  m.xbestsplit = rf_old::transpose(xbestsplit.data(), T, nrnodes);
  m.n_xbestsplit[0] = nrnodes; m.n_xbestsplit[1] = T;
  m.ndbigtree = copyArr(ndbigtree);  // vector: transpose is identity
  m.n_ndbigtree[0] = T; m.n_ndbigtree[1] = 1;
  std::vector<int> ol = {-1, 1}, nl = {1, 2};
  m.orig_labels = copyArr(ol);
  m.n_orig_labels[0] = 1; m.n_orig_labels[1] = C;
  m.new_labels = copyArr(nl);
  m.n_new_labels[0] = 1; m.n_new_labels[1] = C;
  std::vector<double> cw = {1.0, 1.0}, co = {0.5, 0.5};
  m.classwt = copyArr(cw);
  m.n_classwt[0] = 1; m.n_classwt[1] = C;
  m.cutoff = copyArr(co);
  m.n_cutoff[0] = 1; m.n_cutoff[1] = C;
  // a dense >128 double array too (errtr), mostly nonzero
  std::vector<double> errtr((C + 1) * T * 20, 0.25);
  errtr[3] = 0.0;
  m.errtr = copyArr(errtr);
  m.n_errtr[0] = C + 1; m.n_errtr[1] = T * 20;
}

template <typename T>
static void dumpArr (const char* name, T const* p, int n0, int n1) {
  std::printf("%s %d %d", name, n0, n1);
  long n = (long)n0 * n1;
  for (long i = 0; i < n; ++i) {
    if (std::is_integral<T>::value) { std::printf(" %d", (int)p[i]); }
    else { std::printf(" %.17g", (double)p[i]); }
  }
  std::printf("\n");
}

static void dump (Model const& m) {
  std::printf("nrnodes %d\nntree %d\nmtry %d\nnclass %d\n",
              m.nrnodes, m.ntree, m.mtry, m.nclass);
  dumpArr("treemap", m.treemap, m.n_treemap[0], m.n_treemap[1]);
  dumpArr("nodestatus", m.nodestatus, m.n_nodestatus[0],
          m.n_nodestatus[1]);
  dumpArr("nodeclass", m.nodeclass, m.n_nodeclass[0], m.n_nodeclass[1]);
  dumpArr("bestvar", m.bestvar, m.n_bestvar[0], m.n_bestvar[1]);
  dumpArr("xbestsplit", m.xbestsplit, m.n_xbestsplit[0],
          m.n_xbestsplit[1]);
  dumpArr("ndbigtree", m.ndbigtree, m.n_ndbigtree[0], m.n_ndbigtree[1]);
  dumpArr("orig_labels", m.orig_labels, m.n_orig_labels[0],
          m.n_orig_labels[1]);
  dumpArr("new_labels", m.new_labels, m.n_new_labels[0],
          m.n_new_labels[1]);
  dumpArr("classwt", m.classwt, m.n_classwt[0], m.n_classwt[1]);
  dumpArr("cutoff", m.cutoff, m.n_cutoff[0], m.n_cutoff[1]);
  dumpArr("errtr", m.errtr, m.n_errtr[0], m.n_errtr[1]);
}

int main (int argc, char** argv) {
  if (argc < 3) { std::fprintf(stderr, "usage: make|dump <file>\n"); return 2; }
  std::string cmd = argv[1];
  if (cmd == "make") {
    Model m;
    fillSynthetic(m);
    rf_old::writeModelToBinaryFile(argv[2], m);
    std::printf("ok\n");
  } else if (cmd == "dump") {
    Model m;
    rf_old::readModelFromBinaryFile(m, argv[2]);
    dump(m);
  } else { return 2; }
  return 0;
}
