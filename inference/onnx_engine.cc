// onnx_engine.cc — see onnx_engine.h. Operator interpreter over the
// exporter's opset-13 subset (deeplabv3p_tpu/export/onnx/convert.py).
//
// Design notes:
//   * All float compute is f32; integers (shape/index tensors) are
//     carried as int64; booleans as uint8. That matches what the
//     exporter emits (bf16 is mapped to f32 at export time).
//   * Shapes are static: every node's output shape derives from its
//     input shapes + attributes at run time, no shape inference pass.
//   * Convolutions run as per-group im2col + a small f32 GEMM; pools,
//     transposes, reductions and einsums are strided loops. This is a
//     CPU reference engine in the mold of the reference's MNN app, not
//     the TPU fast path (that's XLA); clarity and exactness win.
//   * Intermediates are freed at their last use (precomputed liveness)
//     so peak memory stays near the widest layer, matching how the
//     reference's interpreter engines manage tensor arenas.

#include "onnx_engine.h"

#include <dlfcn.h>

#include <algorithm>
#include <thread>
#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <functional>
#include <limits>
#include <map>
#include <numeric>
#include <sstream>
#include <unordered_map>
#include <unordered_set>

#include "onnx.pb.h"

namespace dlp {
namespace {

namespace pb = dlp_onnx;

enum class DT { F32, I64, BOOL };

struct Tensor {
  DT dt = DT::F32;
  std::vector<int64_t> dims;
  std::vector<float> f;
  std::vector<int64_t> i;
  std::vector<uint8_t> b;

  int64_t numel() const {
    int64_t n = 1;
    for (int64_t d : dims) n *= d;
    return n;
  }
  void alloc() {
    size_t n = size_t(numel());
    if (dt == DT::F32) f.assign(n, 0.f);
    else if (dt == DT::I64) i.assign(n, 0);
    else b.assign(n, 0);
  }
};

std::string DimsStr(const std::vector<int64_t>& d) {
  std::ostringstream os;
  os << "(";
  for (size_t k = 0; k < d.size(); ++k) os << (k ? "," : "") << d[k];
  os << ")";
  return os.str();
}

// Row-major element strides.
std::vector<int64_t> Strides(const std::vector<int64_t>& dims) {
  std::vector<int64_t> s(dims.size(), 1);
  for (int k = int(dims.size()) - 2; k >= 0; --k) s[k] = s[k + 1] * dims[k + 1];
  return s;
}

// Strides usable against a broadcast target shape: 0 where dim == 1.
std::vector<int64_t> BroadcastStrides(const std::vector<int64_t>& dims,
                                      const std::vector<int64_t>& out) {
  std::vector<int64_t> s = Strides(dims);
  std::vector<int64_t> r(out.size(), 0);
  int off = int(out.size() - dims.size());
  for (size_t k = 0; k < dims.size(); ++k)
    r[off + k] = dims[k] == 1 ? 0 : s[k];
  return r;
}

bool BroadcastShape(const std::vector<int64_t>& a,
                    const std::vector<int64_t>& b,
                    std::vector<int64_t>* out) {
  size_t rank = std::max(a.size(), b.size());
  out->assign(rank, 1);
  for (size_t k = 0; k < rank; ++k) {
    int64_t da = k < rank - a.size() ? 1 : a[k - (rank - a.size())];
    int64_t db = k < rank - b.size() ? 1 : b[k - (rank - b.size())];
    if (da != db && da != 1 && db != 1) return false;
    (*out)[k] = std::max(da, db);
  }
  return true;
}

// Mixed-radix counter walking a shape in row-major order while
// maintaining per-operand flat offsets incrementally.
struct OffsetWalker {
  std::vector<int64_t> dims;
  std::vector<std::vector<int64_t>> strides;  // one per tracked operand
  std::vector<int64_t> idx;
  std::vector<int64_t> off;

  OffsetWalker(std::vector<int64_t> d,
               std::vector<std::vector<int64_t>> s)
      : dims(std::move(d)), strides(std::move(s)),
        idx(dims.size(), 0), off(strides.size(), 0) {}

  bool Next() {  // returns false after the last element
    for (int k = int(dims.size()) - 1; k >= 0; --k) {
      ++idx[k];
      for (size_t t = 0; t < strides.size(); ++t) off[t] += strides[t][k];
      if (idx[k] < dims[k]) return true;
      for (size_t t = 0; t < strides.size(); ++t)
        off[t] -= strides[t][k] * dims[k];
      idx[k] = 0;
    }
    return false;
  }
};

// ---------------------------------------------------------------------
// Broadcast iteration fast path. Finds the longest tail of output axes
// over which every tracked operand is either constant (stride 0
// throughout) or row-major contiguous, so the hot inner loop is flat
// (step 0 or 1) and vectorizes; only the remaining outer axes ride the
// mixed-radix walker. For same-shape operands the tail is the whole
// tensor and the walker runs exactly once.
// ---------------------------------------------------------------------

struct BroadcastPlan {
  std::vector<int64_t> outer_dims;          // dims[:t], {1} when empty
  std::vector<std::vector<int64_t>> outer;  // per-operand strides[:t]
  std::vector<int64_t> step;                // per-operand inner step: 0|1
  int64_t inner = 1;                        // flat tail length
};

BroadcastPlan PlanBroadcast(const std::vector<int64_t>& dims,
                            const std::vector<std::vector<int64_t>>& strides) {
  BroadcastPlan p;
  const size_t nops = strides.size(), rank = dims.size();
  std::vector<int64_t> cont = Strides(dims);
  std::vector<bool> all_zero(nops, true), all_cont(nops, true);
  size_t t = rank;
  while (t > 0) {
    const size_t k = t - 1;
    std::vector<bool> az = all_zero, ac = all_cont;
    bool ok = true;
    for (size_t o = 0; o < nops; ++o) {
      az[o] = az[o] && strides[o][k] == 0;
      ac[o] = ac[o] && strides[o][k] == cont[k];
      if (!az[o] && !ac[o]) {
        ok = false;
        break;
      }
    }
    if (!ok) break;
    all_zero = std::move(az);
    all_cont = std::move(ac);
    --t;
  }
  for (size_t k = t; k < rank; ++k) p.inner *= dims[k];
  p.step.resize(nops);
  for (size_t o = 0; o < nops; ++o) p.step[o] = all_zero[o] ? 0 : 1;
  p.outer_dims.assign(dims.begin(), dims.begin() + t);
  if (p.outer_dims.empty()) p.outer_dims = {1};
  p.outer.resize(nops);
  for (size_t o = 0; o < nops; ++o) {
    p.outer[o].assign(strides[o].begin(), strides[o].begin() + t);
    if (p.outer[o].empty()) p.outer[o] = {0};
  }
  return p;
}

// out[k] = f(a[...], b[...]) over the broadcast shape `dims`.
template <typename F>
void ForEachBroadcast2(const std::vector<int64_t>& dims,
                       const std::vector<int64_t>& sa,
                       const std::vector<int64_t>& sb, const float* pa,
                       const float* pb, float* po, F f) {
  BroadcastPlan p = PlanBroadcast(dims, {sa, sb});
  const int64_t L = p.inner;
  const bool ia = p.step[0] == 1, ib = p.step[1] == 1;
  auto span = [&](const float* __restrict A, const float* __restrict B,
                  float* __restrict o, int64_t len) {
    if (ia && ib) {
      for (int64_t i = 0; i < len; ++i) o[i] = f(A[i], B[i]);
    } else if (ia) {
      const float y = *B;
      for (int64_t i = 0; i < len; ++i) o[i] = f(A[i], y);
    } else if (ib) {
      const float x = *A;
      for (int64_t i = 0; i < len; ++i) o[i] = f(x, B[i]);
    } else {
      const float v = f(*A, *B);
      for (int64_t i = 0; i < len; ++i) o[i] = v;
    }
  };
  int64_t outer_count = 1;
  for (int64_t d : p.outer_dims) outer_count *= d;
  if (outer_count == 1) {
    // whole-tensor flat tail (same-shape or scalar operands, the common
    // big case): chunk it across the worker threads
    ParallelFor(L, 1 << 15, [&](int64_t lo, int64_t hi) {
      span(pa + (ia ? lo : 0), pb + (ib ? lo : 0), po + lo, hi - lo);
    });
    return;
  }
  OffsetWalker w(p.outer_dims, p.outer);
  do {
    span(pa + w.off[0], pb + w.off[1], po, L);
    po += L;
  } while (w.Next());
}

// ---------------------------------------------------------------------
// attribute helpers
// ---------------------------------------------------------------------

const pb::AttributeProto* FindAttr(const pb::NodeProto& n,
                                   const std::string& name) {
  for (const auto& a : n.attribute())
    if (a.name() == name) return &a;
  return nullptr;
}

int64_t AttrInt(const pb::NodeProto& n, const std::string& name,
                int64_t dflt) {
  const auto* a = FindAttr(n, name);
  return a ? a->i() : dflt;
}

std::vector<int64_t> AttrInts(const pb::NodeProto& n, const std::string& name,
                              std::vector<int64_t> dflt = {}) {
  const auto* a = FindAttr(n, name);
  if (!a) return dflt;
  return {a->ints().begin(), a->ints().end()};
}

std::string AttrStr(const pb::NodeProto& n, const std::string& name,
                    const std::string& dflt) {
  const auto* a = FindAttr(n, name);
  return a ? a->s() : dflt;
}

float AttrFloat(const pb::NodeProto& n, const std::string& name,
                float dflt) {
  const auto* a = FindAttr(n, name);
  return a ? a->f() : dflt;
}

// ---------------------------------------------------------------------
// TensorProto → Tensor
// ---------------------------------------------------------------------

bool TensorFromProto(const pb::TensorProto& t, Tensor* out, std::string* err) {
  out->dims.assign(t.dims().begin(), t.dims().end());
  int64_t n = out->numel();
  const std::string& raw = t.raw_data();
  auto need = [&](size_t elt) {
    if (raw.size() != size_t(n) * elt) {
      *err = "initializer " + t.name() + ": raw_data size mismatch";
      return false;
    }
    return true;
  };
  switch (t.data_type()) {
    case pb::TensorProto::FLOAT: {
      out->dt = DT::F32;
      if (!need(4)) return false;
      out->f.resize(n);
      std::memcpy(out->f.data(), raw.data(), raw.size());
      return true;
    }
    case pb::TensorProto::DOUBLE: {
      out->dt = DT::F32;
      if (!need(8)) return false;
      out->f.resize(n);
      const double* p = reinterpret_cast<const double*>(raw.data());
      for (int64_t k = 0; k < n; ++k) out->f[k] = float(p[k]);
      return true;
    }
    case pb::TensorProto::INT64: {
      out->dt = DT::I64;
      if (!need(8)) return false;
      out->i.resize(n);
      std::memcpy(out->i.data(), raw.data(), raw.size());
      return true;
    }
    case pb::TensorProto::INT32: {
      out->dt = DT::I64;
      if (!need(4)) return false;
      out->i.resize(n);
      const int32_t* p = reinterpret_cast<const int32_t*>(raw.data());
      for (int64_t k = 0; k < n; ++k) out->i[k] = p[k];
      return true;
    }
    case pb::TensorProto::BOOL: {
      out->dt = DT::BOOL;
      if (!need(1)) return false;
      out->b.resize(n);
      std::memcpy(out->b.data(), raw.data(), raw.size());
      return true;
    }
    default:
      *err = "initializer " + t.name() + ": unsupported data_type " +
             std::to_string(t.data_type());
      return false;
  }
}

// ---------------------------------------------------------------------
// f32 GEMM: C[M,N] += A[M,K] * B[K,N], all row-major contiguous.
//
// Fast path: a wheel-bundled OpenBLAS (numpy/scipy/opencv all ship one)
// resolved via dlopen at first use — never linked, so the binary stays
// self-contained and falls back to the portable loop when absent.
// CMake bakes the discovered library path in as
// DEEPLAB_OPENBLAS_DEFAULT; DEEPLAB_OPENBLAS overrides it at runtime
// (a path, or "off" to force the portable loop). Only LP64 builds with
// plain `cblas_sgemm` / `scipy_cblas_sgemm` symbols are accepted (the
// suffixed ILP64 `*64_` variants have a different int width).
// ---------------------------------------------------------------------

// CBLAS row-major / no-transpose enums.
constexpr int kCblasRowMajor = 101;
constexpr int kCblasNoTrans = 111;

using CblasSgemmFn = void (*)(int order, int trans_a, int trans_b, int m,
                              int n, int k, float alpha, const float* a,
                              int lda, const float* b, int ldb, float beta,
                              float* c, int ldc);

// --threads state. g_threads drives the engine's own chunked loops;
// the OpenBLAS thread setter (resolved from the same dlopen handle as
// sgemm) covers the GEMM side.
int g_threads = 1;
using BlasSetThreadsFn = void (*)(int);
BlasSetThreadsFn g_blas_set_threads = nullptr;

CblasSgemmFn ResolveBlasSgemm() {
  std::vector<std::string> candidates;
  if (const char* env = std::getenv("DEEPLAB_OPENBLAS")) {
    std::string v = env;
    if (v == "off" || v == "0" || v.empty()) return nullptr;
    candidates.push_back(v);
  }
#ifdef DEEPLAB_OPENBLAS_DEFAULT
  candidates.push_back(DEEPLAB_OPENBLAS_DEFAULT);
#endif
  for (const std::string& path : candidates) {
    if (path.empty()) continue;
    void* h = dlopen(path.c_str(), RTLD_NOW | RTLD_LOCAL);
    if (!h) continue;
    for (const char* sym : {"cblas_sgemm", "scipy_cblas_sgemm"}) {
      if (void* fn = dlsym(h, sym)) {
        for (const char* st : {"scipy_openblas_set_num_threads",
                               "openblas_set_num_threads",
                               "goto_set_num_threads"}) {
          if (void* sfn = dlsym(h, st)) {
            g_blas_set_threads = reinterpret_cast<BlasSetThreadsFn>(sfn);
            break;
          }
        }
        return reinterpret_cast<CblasSgemmFn>(fn);
      }
    }
    dlclose(h);
  }
  return nullptr;
}

CblasSgemmFn BlasSgemm() {
  static CblasSgemmFn fn = ResolveBlasSgemm();
  return fn;
}

// Chunked parallel-for over [0, n): splits into at most g_threads
// contiguous ranges of >= grain elements and runs them on plain
// std::threads (one of them this thread). Each range writes a disjoint
// output span, so there is no shared mutable state and no accumulation
// reorder — multithreaded results are bit-identical. Thread spawn is
// ~50 us, so `grain` keeps small ops inline.
template <typename F>
void ParallelFor(int64_t n, int64_t grain, F body) {
  if (n <= 0) return;
  const int64_t chunks =
      std::min<int64_t>(g_threads, std::max<int64_t>(1, n / grain));
  if (chunks <= 1) {
    body(int64_t(0), n);
    return;
  }
  const int64_t per = (n + chunks - 1) / chunks;
  std::vector<std::thread> ts;
  ts.reserve(size_t(chunks - 1));
  for (int64_t t = 1; t < chunks; ++t) {
    const int64_t lo = t * per, hi = std::min(n, lo + per);
    if (lo < hi) ts.emplace_back([=, &body] { body(lo, hi); });
  }
  body(int64_t(0), std::min(n, per));
  for (auto& th : ts) th.join();
}

// Portable fallback: m-k-n loop order keeps the inner loop contiguous in
// both B and C so the compiler vectorizes it.
// `accumulate=false` promises C is freshly zeroed, letting BLAS skip the
// read-modify pass (beta=0); the portable loop accumulates either way,
// which is identical on zeroed C.
void Gemm(int64_t M, int64_t N, int64_t K, const float* __restrict A,
          const float* __restrict B, float* __restrict C,
          bool accumulate = true) {
  // Tiny products aren't worth the BLAS call overhead.
  if (M * N * K >= 4096) {
    if (CblasSgemmFn blas = BlasSgemm()) {
      blas(kCblasRowMajor, kCblasNoTrans, kCblasNoTrans, int(M), int(N),
           int(K), 1.f, A, int(K), B, int(N),
           /*beta=*/accumulate ? 1.f : 0.f, C, int(N));
      return;
    }
  }
  for (int64_t m = 0; m < M; ++m) {
    float* __restrict c = C + m * N;
    for (int64_t k = 0; k < K; ++k) {
      const float a = A[m * K + k];
      if (a == 0.f) continue;
      const float* __restrict b = B + k * N;
      for (int64_t n = 0; n < N; ++n) c[n] += a * b[n];
    }
  }
}

// ---------------------------------------------------------------------
// per-op kernels. `Ins` are resolved input tensors in node order.
// ---------------------------------------------------------------------

using Ins = std::vector<const Tensor*>;

bool Fail(std::string* err, const pb::NodeProto& n, const std::string& msg) {
  *err = n.op_type() + " '" + n.name() + "': " + msg;
  return false;
}

bool OpElementwiseBinary(const pb::NodeProto& n, const Ins& in, Tensor* out,
                         std::string* err) {
  if (in.size() == 1) {  // variadic Max/Min with one operand
    *out = *in[0];
    return true;
  }
  // Max/Min are variadic in ONNX; fold pairwise.
  Tensor acc_store;
  const Tensor* acc = in[0];
  for (size_t v = 1; v < in.size(); ++v) {
    const Tensor& a = *acc;
    const Tensor& b = *in[v];
    if (a.dt != DT::F32 || b.dt != DT::F32)
      return Fail(err, n, "non-f32 arithmetic");
    Tensor res;
    res.dt = DT::F32;
    if (!BroadcastShape(a.dims, b.dims, &res.dims))
      return Fail(err, n, "bad broadcast " + DimsStr(a.dims) + " vs " +
                              DimsStr(b.dims));
    res.f.resize(res.numel());
    const std::string& op = n.op_type();
    // one broadcast-planned loop per op: flat vectorizable inner loop,
    // op dispatched ONCE per node (not per element)
    auto run = [&](auto f) {
      ForEachBroadcast2(res.dims, BroadcastStrides(a.dims, res.dims),
                        BroadcastStrides(b.dims, res.dims), a.f.data(),
                        b.f.data(), res.f.data(), f);
      return true;
    };
    bool ok;
    if (op == "Add") ok = run([](float x, float y) { return x + y; });
    else if (op == "Sub") ok = run([](float x, float y) { return x - y; });
    else if (op == "Mul") ok = run([](float x, float y) { return x * y; });
    else if (op == "Div") ok = run([](float x, float y) { return x / y; });
    else if (op == "Max") ok = run([](float x, float y) { return std::max(x, y); });
    else if (op == "Min") ok = run([](float x, float y) { return std::min(x, y); });
    else return Fail(err, n, "unknown binary op");
    (void)ok;
    acc_store = std::move(res);
    acc = &acc_store;
  }
  *out = std::move(acc_store);
  return true;
}

bool OpUnary(const pb::NodeProto& n, const Ins& in, Tensor* out,
             std::string* err) {
  const Tensor& a = *in[0];
  const std::string& op = n.op_type();
  if (op == "Identity") {
    *out = a;
    return true;
  }
  if (a.dt != DT::F32) return Fail(err, n, "non-f32 unary");
  out->dt = DT::F32;
  out->dims = a.dims;
  out->f.resize(a.numel());
  int64_t total = a.numel();
  const float* __restrict p = a.f.data();
  float* __restrict q = out->f.data();
  auto map1 = [&](auto f) {
    ParallelFor(total, 1 << 15, [&](int64_t lo, int64_t hi) {
      for (int64_t k = lo; k < hi; ++k) q[k] = f(p[k]);
    });
    return true;
  };
  if (op == "Exp") return map1([](float v) { return std::exp(v); });
  if (op == "Sqrt") return map1([](float v) { return std::sqrt(v); });
  if (op == "Reciprocal") return map1([](float v) { return 1.f / v; });
  if (op == "Sigmoid")
    return map1([](float v) { return 1.f / (1.f + std::exp(-v)); });
  if (op == "Erf") return map1([](float v) { return std::erf(v); });
  if (op == "Tanh") return map1([](float v) { return std::tanh(v); });
  return Fail(err, n, "unknown unary op");
}

bool OpEqual(const pb::NodeProto& n, const Ins& in, Tensor* out,
             std::string* err) {
  const Tensor& a = *in[0];
  const Tensor& b = *in[1];
  out->dt = DT::BOOL;
  if (!BroadcastShape(a.dims, b.dims, &out->dims))
    return Fail(err, n, "bad broadcast");
  out->b.resize(out->numel());
  auto get = [](const Tensor& t, int64_t k) -> double {
    if (t.dt == DT::F32) return t.f[k];
    if (t.dt == DT::I64) return double(t.i[k]);
    return double(t.b[k]);
  };
  OffsetWalker w(out->dims, {BroadcastStrides(a.dims, out->dims),
                             BroadcastStrides(b.dims, out->dims)});
  int64_t k = 0;
  do {
    out->b[k++] = get(a, w.off[0]) == get(b, w.off[1]) ? 1 : 0;
  } while (w.Next());
  return true;
}

bool OpNot(const pb::NodeProto& n, const Ins& in, Tensor* out,
           std::string* err) {
  if (in[0]->dt != DT::BOOL) return Fail(err, n, "Not needs bool");
  *out = *in[0];
  for (auto& v : out->b) v = v ? 0 : 1;
  return true;
}

bool OpWhere(const pb::NodeProto& n, const Ins& in, Tensor* out,
             std::string* err) {
  const Tensor& c = *in[0];
  const Tensor& x = *in[1];
  const Tensor& y = *in[2];
  if (c.dt != DT::BOOL) return Fail(err, n, "Where needs bool pred");
  if (x.dt != y.dt) return Fail(err, n, "Where branch dtype mismatch");
  std::vector<int64_t> s1;
  if (!BroadcastShape(c.dims, x.dims, &s1) ||
      !BroadcastShape(s1, y.dims, &out->dims))
    return Fail(err, n, "bad broadcast");
  out->dt = x.dt;
  out->alloc();
  OffsetWalker w(out->dims, {BroadcastStrides(c.dims, out->dims),
                             BroadcastStrides(x.dims, out->dims),
                             BroadcastStrides(y.dims, out->dims)});
  int64_t k = 0;
  do {
    bool take_x = c.b[w.off[0]] != 0;
    if (out->dt == DT::F32)
      out->f[k] = take_x ? x.f[w.off[1]] : y.f[w.off[2]];
    else if (out->dt == DT::I64)
      out->i[k] = take_x ? x.i[w.off[1]] : y.i[w.off[2]];
    else
      out->b[k] = take_x ? x.b[w.off[1]] : y.b[w.off[2]];
    ++k;
  } while (w.Next());
  return true;
}

bool OpCast(const pb::NodeProto& n, const Ins& in, Tensor* out,
            std::string* err) {
  int64_t to = AttrInt(n, "to", 0);
  const Tensor& a = *in[0];
  out->dims = a.dims;
  int64_t total = a.numel();
  auto get = [&](int64_t k) -> double {
    if (a.dt == DT::F32) return a.f[k];
    if (a.dt == DT::I64) return double(a.i[k]);
    return double(a.b[k]);
  };
  if (to == pb::TensorProto::FLOAT) {
    out->dt = DT::F32;
    out->f.resize(total);
    for (int64_t k = 0; k < total; ++k) out->f[k] = float(get(k));
  } else if (to == pb::TensorProto::INT64 || to == pb::TensorProto::INT32) {
    out->dt = DT::I64;
    out->i.resize(total);
    for (int64_t k = 0; k < total; ++k) out->i[k] = int64_t(get(k));
  } else if (to == pb::TensorProto::BOOL) {
    out->dt = DT::BOOL;
    out->b.resize(total);
    for (int64_t k = 0; k < total; ++k) out->b[k] = get(k) != 0.0;
  } else {
    return Fail(err, n, "unsupported cast target " + std::to_string(to));
  }
  return true;
}

bool OpReshape(const pb::NodeProto& n, const Ins& in, Tensor* out,
               std::string* err) {
  const Tensor& a = *in[0];
  const Tensor& shp = *in[1];
  if (shp.dt != DT::I64) return Fail(err, n, "shape must be int64");
  std::vector<int64_t> dims(shp.i.begin(), shp.i.end());
  int64_t known = 1, neg = -1;
  for (size_t k = 0; k < dims.size(); ++k) {
    if (dims[k] == -1) neg = int64_t(k);
    else known *= dims[k];
  }
  if (neg >= 0) dims[neg] = a.numel() / std::max<int64_t>(known, 1);
  int64_t total = 1;
  for (int64_t d : dims) total *= d;
  if (total != a.numel())
    return Fail(err, n, "numel mismatch " + DimsStr(a.dims) + " -> " +
                            DimsStr(dims));
  *out = a;
  out->dims = dims;
  return true;
}

bool OpTranspose(const pb::NodeProto& n, const Ins& in, Tensor* out,
                 std::string* err) {
  const Tensor& a = *in[0];
  std::vector<int64_t> perm = AttrInts(n, "perm");
  if (perm.empty()) {
    perm.resize(a.dims.size());
    for (size_t k = 0; k < perm.size(); ++k)
      perm[k] = int64_t(perm.size() - 1 - k);
  }
  if (perm.size() != a.dims.size()) return Fail(err, n, "perm rank mismatch");
  out->dt = a.dt;
  out->dims.resize(perm.size());
  std::vector<int64_t> in_strides = Strides(a.dims);
  std::vector<int64_t> walk(perm.size());
  for (size_t k = 0; k < perm.size(); ++k) {
    out->dims[k] = a.dims[perm[k]];
    walk[k] = in_strides[perm[k]];
  }
  out->alloc();
  if (out->dims.empty() || out->numel() == 0) {
    out->f = a.f;
    out->i = a.i;
    out->b = a.b;
    return true;
  }
  // Layout transposes (NHWC<->NCHW around every conv) are batched 2-D
  // transposes: after dropping size-1 axes they normalize to dims
  // [D0,D1] walk [1,D0] (optionally a leading batch axis). Run those
  // cache-blocked instead of strided-gather.
  if (a.dt == DT::F32) {
    std::vector<int64_t> nd, nw;
    for (size_t k = 0; k < out->dims.size(); ++k)
      if (out->dims[k] != 1) {
        nd.push_back(out->dims[k]);
        nw.push_back(walk[k]);
      }
    // merge adjacent output axes that walk the input contiguously as a
    // pair (stride composes): canonicalizes rank-4 layout transposes
    // like NHWC->NCHW down to a plain 2-D transpose
    for (size_t k = 0; k + 1 < nd.size();) {
      if (nw[k] == nw[k + 1] * nd[k + 1]) {
        nd[k] *= nd[k + 1];
        nw[k] = nw[k + 1];
        nd.erase(nd.begin() + k + 1);
        nw.erase(nw.begin() + k + 1);
      } else {
        ++k;
      }
    }
    auto blocked2d = [](const float* __restrict src, int64_t R, int64_t C,
                        float* __restrict dst) {
      // src is (R,C) row-major; dst becomes (C,R)
      constexpr int64_t T = 48;
      for (int64_t i0 = 0; i0 < C; i0 += T)
        for (int64_t j0 = 0; j0 < R; j0 += T) {
          const int64_t i1 = std::min(i0 + T, C), j1 = std::min(j0 + T, R);
          for (int64_t i = i0; i < i1; ++i)
            for (int64_t j = j0; j < j1; ++j) dst[i * R + j] = src[j * C + i];
        }
    };
    if (nd.size() == 2 && nw[0] == 1 && nw[1] == nd[0]) {
      blocked2d(a.f.data(), nd[1], nd[0], out->f.data());
      return true;
    }
    if (nd.size() == 3 && nw[0] == nd[1] * nd[2] && nw[1] == 1 &&
        nw[2] == nd[1]) {
      const int64_t plane = nd[1] * nd[2];
      for (int64_t b = 0; b < nd[0]; ++b)
        blocked2d(a.f.data() + b * plane, nd[2], nd[1],
                  out->f.data() + b * plane);
      return true;
    }
  }
  // flatten the innermost output axis: writes are contiguous, reads a
  // constant-stride gather (memcpy when the inner axis is untouched)
  const int64_t L = out->dims.back();
  const int64_t s = walk.back();
  std::vector<int64_t> outer_dims(out->dims.begin(), out->dims.end() - 1);
  std::vector<int64_t> outer_walk(walk.begin(), walk.end() - 1);
  if (outer_dims.empty()) {
    outer_dims = {1};
    outer_walk = {0};
  }
  OffsetWalker w(outer_dims, {outer_walk});
  int64_t k = 0;
  if (a.dt == DT::F32) {
    const float* __restrict p = a.f.data();
    float* __restrict q = out->f.data();
    do {
      const int64_t off = w.off[0];
      if (s == 1) std::memcpy(q + k, p + off, L * sizeof(float));
      else
        for (int64_t i = 0; i < L; ++i) q[k + i] = p[off + i * s];
      k += L;
    } while (w.Next());
  } else if (a.dt == DT::I64) {
    do {
      const int64_t off = w.off[0];
      for (int64_t i = 0; i < L; ++i) out->i[k + i] = a.i[off + i * s];
      k += L;
    } while (w.Next());
  } else {
    do {
      const int64_t off = w.off[0];
      for (int64_t i = 0; i < L; ++i) out->b[k + i] = a.b[off + i * s];
      k += L;
    } while (w.Next());
  }
  return true;
}

bool OpConcat(const pb::NodeProto& n, const Ins& in, Tensor* out,
              std::string* err) {
  int64_t axis = AttrInt(n, "axis", 0);
  const Tensor& first = *in[0];
  if (axis < 0) axis += int64_t(first.dims.size());
  out->dt = first.dt;
  out->dims = first.dims;
  out->dims[axis] = 0;
  for (const Tensor* t : in) {
    if (t->dt != first.dt) return Fail(err, n, "dtype mismatch");
    out->dims[axis] += t->dims[axis];
  }
  out->alloc();
  int64_t outer = 1, inner = 1;
  for (int64_t k = 0; k < axis; ++k) outer *= first.dims[k];
  for (size_t k = axis + 1; k < first.dims.size(); ++k) inner *= first.dims[k];
  int64_t out_row = out->dims[axis] * inner;
  int64_t col = 0;
  for (const Tensor* t : in) {
    int64_t rows = t->dims[axis] * inner;
    for (int64_t o = 0; o < outer; ++o) {
      if (out->dt == DT::F32)
        std::memcpy(out->f.data() + o * out_row + col,
                    t->f.data() + o * rows, rows * sizeof(float));
      else if (out->dt == DT::I64)
        std::memcpy(out->i.data() + o * out_row + col,
                    t->i.data() + o * rows, rows * sizeof(int64_t));
      else
        std::memcpy(out->b.data() + o * out_row + col,
                    t->b.data() + o * rows, rows);
    }
    col += rows;
  }
  return true;
}

bool OpExpand(const pb::NodeProto& n, const Ins& in, Tensor* out,
              std::string* err) {
  const Tensor& a = *in[0];
  const Tensor& shp = *in[1];
  std::vector<int64_t> want(shp.i.begin(), shp.i.end());
  if (!BroadcastShape(a.dims, want, &out->dims))
    return Fail(err, n, "bad expand");
  out->dt = a.dt;
  out->alloc();
  OffsetWalker w(out->dims, {BroadcastStrides(a.dims, out->dims)});
  int64_t k = 0;
  do {
    if (a.dt == DT::F32) out->f[k] = a.f[w.off[0]];
    else if (a.dt == DT::I64) out->i[k] = a.i[w.off[0]];
    else out->b[k] = a.b[w.off[0]];
    ++k;
  } while (w.Next());
  return true;
}

bool OpGather(const pb::NodeProto& n, const Ins& in, Tensor* out,
              std::string* err) {
  const Tensor& a = *in[0];
  const Tensor& idx = *in[1];
  if (idx.dt != DT::I64) return Fail(err, n, "indices must be int64");
  int64_t axis = AttrInt(n, "axis", 0);
  if (axis < 0) axis += int64_t(a.dims.size());
  out->dt = a.dt;
  out->dims.clear();
  for (int64_t k = 0; k < axis; ++k) out->dims.push_back(a.dims[k]);
  for (int64_t d : idx.dims) out->dims.push_back(d);
  for (size_t k = axis + 1; k < a.dims.size(); ++k)
    out->dims.push_back(a.dims[k]);
  out->alloc();
  int64_t outer = 1, inner = 1, dim = a.dims[axis];
  for (int64_t k = 0; k < axis; ++k) outer *= a.dims[k];
  for (size_t k = axis + 1; k < a.dims.size(); ++k) inner *= a.dims[k];
  int64_t nidx = idx.numel();
  for (int64_t o = 0; o < outer; ++o) {
    for (int64_t j = 0; j < nidx; ++j) {
      int64_t src = idx.i[j];
      if (src < 0) src += dim;
      if (src < 0 || src >= dim) return Fail(err, n, "index out of range");
      int64_t so = (o * dim + src) * inner;
      int64_t dofs = (o * nidx + j) * inner;
      if (a.dt == DT::F32)
        std::memcpy(out->f.data() + dofs, a.f.data() + so,
                    inner * sizeof(float));
      else if (a.dt == DT::I64)
        std::memcpy(out->i.data() + dofs, a.i.data() + so,
                    inner * sizeof(int64_t));
      else
        std::memcpy(out->b.data() + dofs, a.b.data() + so, inner);
    }
  }
  return true;
}

bool OpSlice(const pb::NodeProto& n, const Ins& in, Tensor* out,
             std::string* err) {
  const Tensor& a = *in[0];
  auto vec = [&](int k) {
    return std::vector<int64_t>(in[k]->i.begin(), in[k]->i.end());
  };
  std::vector<int64_t> starts = vec(1), ends = vec(2);
  std::vector<int64_t> axes, steps;
  if (in.size() > 3) axes = vec(3);
  else for (size_t k = 0; k < starts.size(); ++k) axes.push_back(int64_t(k));
  if (in.size() > 4) steps = vec(4);
  else steps.assign(starts.size(), 1);

  std::vector<int64_t> b(a.dims.size(), 0), e = a.dims,
      st(a.dims.size(), 1);
  for (size_t k = 0; k < axes.size(); ++k) {
    int64_t ax = axes[k] < 0 ? axes[k] + int64_t(a.dims.size()) : axes[k];
    int64_t dim = a.dims[ax];
    int64_t s0 = starts[k] < 0 ? starts[k] + dim : starts[k];
    int64_t e0 = ends[k] < 0 ? ends[k] + dim : ends[k];
    s0 = std::clamp<int64_t>(s0, 0, dim);
    e0 = std::clamp<int64_t>(e0, 0, dim);
    b[ax] = s0;
    e[ax] = e0;
    st[ax] = steps[k];
    if (steps[k] <= 0) return Fail(err, n, "negative step unsupported");
  }
  out->dt = a.dt;
  out->dims.resize(a.dims.size());
  for (size_t k = 0; k < a.dims.size(); ++k)
    out->dims[k] = std::max<int64_t>(0, (e[k] - b[k] + st[k] - 1) / st[k]);
  out->alloc();
  std::vector<int64_t> in_strides = Strides(a.dims);
  std::vector<int64_t> walk(a.dims.size());
  int64_t base = 0;
  for (size_t k = 0; k < a.dims.size(); ++k) {
    walk[k] = in_strides[k] * st[k];
    base += in_strides[k] * b[k];
  }
  if (out->numel() == 0) return true;
  OffsetWalker w(out->dims, {walk});
  int64_t k = 0;
  do {
    int64_t src = base + w.off[0];
    if (a.dt == DT::F32) out->f[k] = a.f[src];
    else if (a.dt == DT::I64) out->i[k] = a.i[src];
    else out->b[k] = a.b[src];
    ++k;
  } while (w.Next());
  return true;
}

bool OpPad(const pb::NodeProto& n, const Ins& in, Tensor* out,
           std::string* err) {
  const Tensor& a = *in[0];
  const Tensor& pads = *in[1];
  if (AttrStr(n, "mode", "constant") != "constant")
    return Fail(err, n, "only constant pad");
  float value = 0.f;
  if (in.size() > 2 && in[2]->numel() == 1)
    value = in[2]->dt == DT::F32 ? in[2]->f[0] : float(in[2]->i[0]);
  size_t rank = a.dims.size();
  if (pads.i.size() != 2 * rank) return Fail(err, n, "pads rank mismatch");
  out->dt = a.dt;
  if (out->dt != DT::F32) return Fail(err, n, "only f32 pad");
  out->dims.resize(rank);
  for (size_t k = 0; k < rank; ++k) {
    if (pads.i[k] < 0 || pads.i[rank + k] < 0)
      return Fail(err, n, "negative pads unsupported");
    out->dims[k] = a.dims[k] + pads.i[k] + pads.i[rank + k];
  }
  out->f.assign(out->numel(), value);
  std::vector<int64_t> out_strides = Strides(out->dims);
  int64_t base = 0;
  for (size_t k = 0; k < rank; ++k) base += pads.i[k] * out_strides[k];
  OffsetWalker w(a.dims, {out_strides});
  int64_t k = 0;
  do {
    out->f[base + w.off[0]] = a.f[k++];
  } while (w.Next());
  return true;
}

bool OpReduce(const pb::NodeProto& n, const Ins& in, Tensor* out,
              std::string* err) {
  const Tensor& a = *in[0];
  if (a.dt != DT::F32) return Fail(err, n, "non-f32 reduce");
  const std::string& op = n.op_type();
  std::vector<int64_t> axes;
  if (op == "ReduceSum" && in.size() > 1)  // opset 13: axes as input
    axes.assign(in[1]->i.begin(), in[1]->i.end());
  else
    axes = AttrInts(n, "axes");
  bool keep = AttrInt(n, "keepdims", 1) != 0;
  std::vector<bool> reduced(a.dims.size(), axes.empty());
  for (int64_t ax : axes) {
    if (ax < 0) ax += int64_t(a.dims.size());
    reduced[ax] = true;
  }
  out->dt = DT::F32;
  out->dims.clear();
  std::vector<int64_t> kept_dims;
  for (size_t k = 0; k < a.dims.size(); ++k) {
    if (!reduced[k]) out->dims.push_back(a.dims[k]);
    else if (keep) out->dims.push_back(1);
  }
  // accumulate: walk the input once, offsetting into the output with
  // stride 0 on reduced dims
  std::vector<int64_t> full_out(a.dims.size());
  for (size_t k = 0; k < a.dims.size(); ++k)
    full_out[k] = reduced[k] ? 1 : a.dims[k];
  std::vector<int64_t> ostr = Strides(full_out);
  for (size_t k = 0; k < a.dims.size(); ++k)
    if (reduced[k]) ostr[k] = 0;
  float init;
  if (op == "ReduceSum") init = 0.f;
  else if (op == "ReduceProd") init = 1.f;
  else if (op == "ReduceMax") init = -std::numeric_limits<float>::infinity();
  else if (op == "ReduceMin") init = std::numeric_limits<float>::infinity();
  else if (op == "ReduceMean") init = 0.f;
  else return Fail(err, n, "unknown reduce");
  out->f.assign(size_t(out->numel()), init);
  // Input is walked contiguously; the output offset pattern (stride 0 on
  // reduced axes) is broadcast-planned so the inner loop is flat: either
  // a horizontal reduction into one cell (trailing axes reduced) or an
  // elementwise accumulate run (trailing axes kept).
  auto accumulate = [&](auto f) {
    BroadcastPlan p = PlanBroadcast(a.dims, {ostr});
    OffsetWalker w(p.outer_dims, p.outer);
    const float* __restrict src = a.f.data();
    float* dst = out->f.data();
    const int64_t L = p.inner;
    if (p.step[0] == 0) {
      do {
        float acc = dst[w.off[0]];
        for (int64_t i = 0; i < L; ++i) acc = f(acc, src[i]);
        dst[w.off[0]] = acc;
        src += L;
      } while (w.Next());
    } else {
      do {
        float* __restrict d = dst + w.off[0];
        for (int64_t i = 0; i < L; ++i) d[i] = f(d[i], src[i]);
        src += L;
      } while (w.Next());
    }
  };
  if (op == "ReduceSum" || op == "ReduceMean")
    accumulate([](float x, float y) { return x + y; });
  else if (op == "ReduceProd")
    accumulate([](float x, float y) { return x * y; });
  else if (op == "ReduceMax")
    accumulate([](float x, float y) { return std::max(x, y); });
  else
    accumulate([](float x, float y) { return std::min(x, y); });
  if (op == "ReduceMean") {
    int64_t cnt = out->numel() == 0 ? 1 : a.numel() / out->numel();
    for (auto& v : out->f) v /= float(cnt);
  }
  return true;
}

// Generic 1/2-operand einsum. The exporter emits einsums for
// dot_general (attention matmuls) and for the constant-folded bilinear
// resize (per-axis interpolation matrices) — no ellipsis, no repeated
// letters inside one operand.
bool OpEinsum(const pb::NodeProto& n, const Ins& in, Tensor* out,
              std::string* err) {
  std::string eq = AttrStr(n, "equation", "");
  eq.erase(std::remove(eq.begin(), eq.end(), ' '), eq.end());
  auto arrow = eq.find("->");
  if (arrow == std::string::npos) return Fail(err, n, "implicit einsum");
  std::string lhs = eq.substr(0, arrow), rhs = eq.substr(arrow + 2);
  std::vector<std::string> terms;
  size_t pos = 0;
  while (true) {
    auto comma = lhs.find(',', pos);
    terms.push_back(lhs.substr(pos, comma - pos));
    if (comma == std::string::npos) break;
    pos = comma + 1;
  }
  if (terms.size() != in.size())
    return Fail(err, n, "operand count mismatch");
  for (const Tensor* t : in)
    if (t->dt != DT::F32) return Fail(err, n, "non-f32 einsum");

  // letter → size
  std::unordered_map<char, int64_t> size;
  for (size_t t = 0; t < terms.size(); ++t) {
    if (terms[t].size() != in[t]->dims.size())
      return Fail(err, n, "term rank mismatch");
    for (size_t k = 0; k < terms[t].size(); ++k) {
      char c = terms[t][k];
      auto it = size.find(c);
      if (it == size.end()) size[c] = in[t]->dims[k];
      else if (it->second != in[t]->dims[k])
        return Fail(err, n, "inconsistent dim for letter");
    }
  }
  std::string contract;
  for (auto& kv : size)
    if (rhs.find(kv.first) == std::string::npos) contract += kv.first;
  std::sort(contract.begin(), contract.end());

  // loop shape = out letters then contraction letters; per-operand strides
  std::string loops = rhs + contract;
  out->dt = DT::F32;
  out->dims.clear();
  for (char c : rhs) out->dims.push_back(size[c]);
  out->f.assign(size_t(out->numel()), 0.f);

  std::vector<std::vector<int64_t>> walk(in.size(),
                                         std::vector<int64_t>(loops.size(), 0));
  for (size_t t = 0; t < in.size(); ++t) {
    std::vector<int64_t> s = Strides(in[t]->dims);
    for (size_t k = 0; k < terms[t].size(); ++k) {
      auto lp = loops.find(terms[t][k]);
      walk[t][lp] = s[k];
    }
  }
  std::vector<int64_t> loop_dims;
  for (char c : loops) loop_dims.push_back(size[c]);

  int64_t n_out = out->numel();
  int64_t n_contract = 1;
  for (char c : contract) n_contract *= size[c];

  if (in.size() == 1) {
    OffsetWalker w(loop_dims, {walk[0]});
    int64_t k = 0;
    do {
      out->f[k / n_contract] += in[0]->f[w.off[0]];
      ++k;
    } while (w.Next());
    return true;
  }

  // 2 operands: iterate output cells; inner contraction walker
  std::vector<int64_t> c_dims(loop_dims.begin() + rhs.size(),
                              loop_dims.end());
  std::vector<int64_t> aw_out(walk[0].begin(), walk[0].begin() + rhs.size());
  std::vector<int64_t> bw_out(walk[1].begin(), walk[1].begin() + rhs.size());
  std::vector<int64_t> aw_c(walk[0].begin() + rhs.size(), walk[0].end());
  std::vector<int64_t> bw_c(walk[1].begin() + rhs.size(), walk[1].end());
  const float* pa = in[0]->f.data();
  const float* pb = in[1]->f.data();
  // fast paths: single contraction letter
  if (c_dims.size() == 1) {
    const int64_t K = c_dims[0], sa = aw_c[0], sb = bw_c[0];
    // When one operand is constant over a contiguous tail of output
    // letters and the other walks it contiguously (the exporter's
    // constant-folded bilinear-resize einsums), the tail block is K
    // vectorized rank-1 updates instead of per-cell strided dots.
    BroadcastPlan p = PlanBroadcast(out->dims, {aw_out, bw_out});
    if (p.inner >= 8 && (p.step[0] == 0) != (p.step[1] == 0)) {
      const bool a_const = p.step[0] == 0;
      OffsetWalker w(p.outer_dims, p.outer);
      const int64_t L = p.inner;
      float* po = out->f.data();
      do {
        const float* a0 = pa + w.off[0];
        const float* b0 = pb + w.off[1];
        float* __restrict dst = po;
        for (int64_t c = 0; c < K; ++c) {
          const float v = a_const ? a0[c * sa] : b0[c * sb];
          if (v == 0.f) continue;
          const float* __restrict src =
              a_const ? b0 + c * sb : a0 + c * sa;
          for (int64_t i = 0; i < L; ++i) dst[i] += v * src[i];
        }
        po += L;
      } while (w.Next());
      return true;
    }
    OffsetWalker w(out->dims, {aw_out, bw_out});
    int64_t k = 0;
    do {
      const float* a0 = pa + w.off[0];
      const float* b0 = pb + w.off[1];
      float acc = 0.f;
      for (int64_t c = 0; c < K; ++c) acc += a0[c * sa] * b0[c * sb];
      out->f[k++] = acc;
    } while (w.Next());
    return true;
  }
  OffsetWalker w(out->dims.empty() ? std::vector<int64_t>{1} : out->dims,
                 {aw_out.empty() ? std::vector<int64_t>{0} : aw_out,
                  bw_out.empty() ? std::vector<int64_t>{0} : bw_out});
  int64_t k = 0;
  do {
    float acc = 0.f;
    if (c_dims.empty()) {
      acc = pa[w.off[0]] * pb[w.off[1]];
    } else {
      OffsetWalker cw(c_dims, {aw_c, bw_c});
      do {
        acc += pa[w.off[0] + cw.off[0]] * pb[w.off[1] + cw.off[1]];
      } while (cw.Next());
    }
    out->f[k++] = acc;
  } while (w.Next());
  (void)n_out;
  return true;
}

// Conv (NCHW, groups, dilations) = per-group im2col + GEMM.
bool OpConv(const pb::NodeProto& n, const Ins& in, Tensor* out,
            std::string* err) {
  const Tensor& x = *in[0];
  const Tensor& w = *in[1];
  if (x.dims.size() != 4 || w.dims.size() != 4)
    return Fail(err, n, "only 2-D conv");
  int64_t N = x.dims[0], C = x.dims[1], H = x.dims[2], W = x.dims[3];
  int64_t M = w.dims[0], Cg = w.dims[1], KH = w.dims[2], KW = w.dims[3];
  int64_t g = AttrInt(n, "group", 1);
  std::vector<int64_t> strides = AttrInts(n, "strides", {1, 1});
  std::vector<int64_t> dil = AttrInts(n, "dilations", {1, 1});
  std::vector<int64_t> pads = AttrInts(n, "pads", {0, 0, 0, 0});
  if (C != Cg * g) return Fail(err, n, "group/channel mismatch");
  int64_t sh = strides[0], sw = strides[1], dh = dil[0], dw = dil[1];
  int64_t pt = pads[0], pl = pads[1], pbm = pads[2], pr = pads[3];
  int64_t KEH = (KH - 1) * dh + 1, KEW = (KW - 1) * dw + 1;
  int64_t OH = (H + pt + pbm - KEH) / sh + 1;
  int64_t OW = (W + pl + pr - KEW) / sw + 1;
  if (OH <= 0 || OW <= 0) return Fail(err, n, "empty output");
  out->dt = DT::F32;
  out->dims = {N, M, OH, OW};
  out->f.assign(size_t(out->numel()), 0.f);

  int64_t Mg = M / g, K = Cg * KH * KW, ON = OH * OW;

  // output epilogue: per-out-channel bias (in[2], from the BN-folding
  // pass) and/or the clamp the clip-fusion pass attached (ReLU/ReLU6's
  // Max/Min nodes) — one output pass instead of the separate chains'
  const float clip_lo =
      AttrFloat(n, "dlp_clip_lo", -std::numeric_limits<float>::infinity());
  const float clip_hi =
      AttrFloat(n, "dlp_clip_hi", std::numeric_limits<float>::infinity());
  const bool has_clip = std::isfinite(clip_lo) || std::isfinite(clip_hi);
  auto add_bias = [&] {
    const float* bias = in.size() >= 3 ? in[2]->f.data() : nullptr;
    if (!bias && !has_clip) return;
    ParallelFor(N * M, std::max<int64_t>(1, (1 << 17) / std::max<int64_t>(
                                                            1, ON)),
                [&](int64_t lo, int64_t hi) {
      for (int64_t bm = lo; bm < hi; ++bm) {
        float* __restrict oc = out->f.data() + bm * ON;
        const float bv = bias ? bias[bm % M] : 0.f;
        if (has_clip) {
          for (int64_t k = 0; k < ON; ++k)
            oc[k] = std::min(std::max(oc[k] + bv, clip_lo), clip_hi);
        } else {
          for (int64_t k = 0; k < ON; ++k) oc[k] += bv;
        }
      }
    });
  };

  // 1x1 stride-1 convs (the bulk of the MobileNet-family pointwise
  // convs) are a plain GEMM over the input feature map — no im2col copy.
  if (KH == 1 && KW == 1 && sh == 1 && sw == 1 && pt == 0 && pl == 0 &&
      pbm == 0 && pr == 0) {
    for (int64_t b = 0; b < N; ++b) {
      for (int64_t gi = 0; gi < g; ++gi) {
        const float* A = w.f.data() + gi * Mg * K;              // [Mg, Cg]
        const float* B = x.f.data() + ((b * C + gi * Cg) * H) * W;
        float* Cp = out->f.data() + ((b * M + gi * Mg) * OH) * OW;
        Gemm(Mg, ON, K, A, B, Cp, /*accumulate=*/false);
      }
    }
    add_bias();
    return true;
  }

  // Depthwise (group == channel) convs: direct stencil, row-contiguous
  // inner loop — im2col+GEMV per channel costs more than the math.
  if (Cg == 1 && Mg == 1) {
    // each channel's output plane is disjoint — chunk channels across
    // the worker threads (grain sized so tiny maps stay inline)
    const int64_t grain_c = std::max<int64_t>(
        1, (1 << 18) / std::max<int64_t>(1, OH * OW * KH * KW));
    for (int64_t b = 0; b < N; ++b) {
      ParallelFor(C, grain_c, [&](int64_t clo, int64_t chi) {
      for (int64_t c = clo; c < chi; ++c) {
        const float* xc = x.f.data() + ((b * C + c) * H) * W;
        const float* wk = w.f.data() + c * KH * KW;
        float* oc = out->f.data() + ((b * M + c) * OH) * OW;
        for (int64_t ky = 0; ky < KH; ++ky) {
          for (int64_t kx = 0; kx < KW; ++kx) {
            const float wv = wk[ky * KW + kx];
            if (wv == 0.f) continue;
            for (int64_t oy = 0; oy < OH; ++oy) {
              const int64_t iy = oy * sh - pt + ky * dh;
              if (iy < 0 || iy >= H) continue;
              const float* __restrict xrow = xc + iy * W;
              float* __restrict orow = oc + oy * OW;
              const int64_t ix0 = -pl + kx * dw;
              const int64_t ox_lo = std::max<int64_t>(0, (-ix0 + sw - 1) / sw);
              const int64_t ox_hi = std::min<int64_t>(
                  OW, ix0 >= W ? 0 : (W - ix0 + sw - 1) / sw);
              if (sw == 1) {
                const float* __restrict xr = xrow + ix0;
                for (int64_t ox = ox_lo; ox < ox_hi; ++ox)
                  orow[ox] += wv * xr[ox];
              } else {
                for (int64_t ox = ox_lo; ox < ox_hi; ++ox)
                  orow[ox] += wv * xrow[ix0 + ox * sw];
              }
            }
          }
        }
      }
      });
    }
    add_bias();
    return true;
  }

  std::vector<float> col(size_t(K) * ON);
  for (int64_t b = 0; b < N; ++b) {
    for (int64_t gi = 0; gi < g; ++gi) {
      // im2col for this group's channels
      for (int64_t c = 0; c < Cg; ++c) {
        const float* xc = x.f.data() + ((b * C + gi * Cg + c) * H) * W;
        for (int64_t ky = 0; ky < KH; ++ky) {
          for (int64_t kx = 0; kx < KW; ++kx) {
            float* dst = col.data() + (((c * KH) + ky) * KW + kx) * ON;
            for (int64_t oy = 0; oy < OH; ++oy) {
              int64_t iy = oy * sh - pt + ky * dh;
              float* drow = dst + oy * OW;
              if (iy < 0 || iy >= H) {
                std::memset(drow, 0, OW * sizeof(float));
                continue;
              }
              const float* xrow = xc + iy * W;
              int64_t ix0 = -pl + kx * dw;
              // clip the valid ox range to avoid per-pixel bounds tests
              int64_t ox_lo = std::max<int64_t>(
                  0, (-ix0 + sw - 1) / sw);
              int64_t ox_hi = std::min<int64_t>(
                  OW, ix0 >= W ? 0 : (W - ix0 + sw - 1) / sw);
              if (ox_lo > 0) std::memset(drow, 0, ox_lo * sizeof(float));
              if (ox_hi < OW)
                std::memset(drow + std::max<int64_t>(ox_hi, 0), 0,
                            (OW - std::max<int64_t>(ox_hi, 0)) *
                                sizeof(float));
              for (int64_t ox = ox_lo; ox < ox_hi; ++ox)
                drow[ox] = xrow[ix0 + ox * sw];
            }
          }
        }
      }
      const float* A = w.f.data() + gi * Mg * K;  // [Mg, K]
      float* Cp = out->f.data() + ((b * M + gi * Mg) * OH) * OW;
      Gemm(Mg, ON, K, A, col.data(), Cp, /*accumulate=*/false);
    }
  }
  add_bias();
  return true;
}

// ConvTranspose (group=1): scatter each input pixel through the kernel.
// Weight layout (I, O, kH, kW) per the exporter.
bool OpConvTranspose(const pb::NodeProto& n, const Ins& in, Tensor* out,
                     std::string* err) {
  const Tensor& x = *in[0];
  const Tensor& w = *in[1];
  if (AttrInt(n, "group", 1) != 1)
    return Fail(err, n, "grouped ConvTranspose unsupported");
  int64_t N = x.dims[0], C = x.dims[1], H = x.dims[2], W = x.dims[3];
  int64_t M = w.dims[1], KH = w.dims[2], KW = w.dims[3];
  if (w.dims[0] != C) return Fail(err, n, "weight in-channel mismatch");
  std::vector<int64_t> strides = AttrInts(n, "strides", {1, 1});
  std::vector<int64_t> dil = AttrInts(n, "dilations", {1, 1});
  std::vector<int64_t> pads = AttrInts(n, "pads", {0, 0, 0, 0});
  std::vector<int64_t> opad = AttrInts(n, "output_padding", {0, 0});
  int64_t sh = strides[0], sw = strides[1], dh = dil[0], dw = dil[1];
  int64_t OH = (H - 1) * sh - (pads[0] + pads[2]) + (KH - 1) * dh + 1 +
               opad[0];
  int64_t OW = (W - 1) * sw - (pads[1] + pads[3]) + (KW - 1) * dw + 1 +
               opad[1];
  out->dt = DT::F32;
  out->dims = {N, M, OH, OW};
  out->f.assign(size_t(out->numel()), 0.f);
  for (int64_t b = 0; b < N; ++b) {
    for (int64_t c = 0; c < C; ++c) {
      const float* xc = x.f.data() + ((b * C + c) * H) * W;
      for (int64_t m = 0; m < M; ++m) {
        const float* wk = w.f.data() + ((c * M + m) * KH) * KW;
        float* oc = out->f.data() + ((b * M + m) * OH) * OW;
        for (int64_t iy = 0; iy < H; ++iy) {
          for (int64_t ix = 0; ix < W; ++ix) {
            float v = xc[iy * W + ix];
            if (v == 0.f) continue;
            int64_t oy0 = iy * sh - pads[0];
            int64_t ox0 = ix * sw - pads[1];
            for (int64_t ky = 0; ky < KH; ++ky) {
              int64_t oy = oy0 + ky * dh;
              if (oy < 0 || oy >= OH) continue;
              for (int64_t kx = 0; kx < KW; ++kx) {
                int64_t ox = ox0 + kx * dw;
                if (ox < 0 || ox >= OW) continue;
                oc[oy * OW + ox] += v * wk[ky * KW + kx];
              }
            }
          }
        }
      }
    }
  }
  return true;
}

bool OpPool(const pb::NodeProto& n, const Ins& in, Tensor* out,
            std::string* err) {
  const Tensor& x = *in[0];
  if (x.dims.size() != 4) return Fail(err, n, "only 2-D pool");
  bool is_max = n.op_type() == "MaxPool";
  std::vector<int64_t> kshape = AttrInts(n, "kernel_shape");
  std::vector<int64_t> strides = AttrInts(n, "strides", {1, 1});
  std::vector<int64_t> pads = AttrInts(n, "pads", {0, 0, 0, 0});
  bool count_pad = AttrInt(n, "count_include_pad", 0) != 0;
  int64_t N = x.dims[0], C = x.dims[1], H = x.dims[2], W = x.dims[3];
  int64_t KH = kshape[0], KW = kshape[1], sh = strides[0], sw = strides[1];
  int64_t pt = pads[0], pl = pads[1], pbm = pads[2], pr = pads[3];
  int64_t OH = (H + pt + pbm - KH) / sh + 1;
  int64_t OW = (W + pl + pr - KW) / sw + 1;
  out->dt = DT::F32;
  out->dims = {N, C, OH, OW};
  out->f.resize(out->numel());
  for (int64_t bc = 0; bc < N * C; ++bc) {
    const float* xc = x.f.data() + bc * H * W;
    float* oc = out->f.data() + bc * OH * OW;
    for (int64_t oy = 0; oy < OH; ++oy) {
      for (int64_t ox = 0; ox < OW; ++ox) {
        int64_t y0 = oy * sh - pt, x0 = ox * sw - pl;
        float acc = is_max ? -std::numeric_limits<float>::infinity() : 0.f;
        int64_t cnt = 0;
        for (int64_t ky = 0; ky < KH; ++ky) {
          int64_t iy = y0 + ky;
          if (iy < 0 || iy >= H) continue;
          for (int64_t kx = 0; kx < KW; ++kx) {
            int64_t ix = x0 + kx;
            if (ix < 0 || ix >= W) continue;
            float v = xc[iy * W + ix];
            if (is_max) acc = std::max(acc, v);
            else acc += v;
            ++cnt;
          }
        }
        if (!is_max) acc /= float(count_pad ? KH * KW : std::max<int64_t>(cnt, 1));
        oc[oy * OW + ox] = acc;
      }
    }
  }
  return true;
}

using OpFn = bool (*)(const pb::NodeProto&, const Ins&, Tensor*,
                      std::string*);

const std::unordered_map<std::string, OpFn>& OpTable() {
  static const auto* table = new std::unordered_map<std::string, OpFn>{
      {"Add", OpElementwiseBinary},  {"Sub", OpElementwiseBinary},
      {"Mul", OpElementwiseBinary},  {"Div", OpElementwiseBinary},
      {"Max", OpElementwiseBinary},  {"Min", OpElementwiseBinary},
      {"Exp", OpUnary},              {"Sqrt", OpUnary},
      {"Reciprocal", OpUnary},       {"Sigmoid", OpUnary},
      {"Erf", OpUnary},              {"Tanh", OpUnary},
      {"Identity", OpUnary},         {"Equal", OpEqual},
      {"Not", OpNot},                {"Where", OpWhere},
      {"Cast", OpCast},              {"Reshape", OpReshape},
      {"Transpose", OpTranspose},    {"Concat", OpConcat},
      {"Expand", OpExpand},          {"Gather", OpGather},
      {"Slice", OpSlice},            {"Pad", OpPad},
      {"ReduceSum", OpReduce},       {"ReduceMax", OpReduce},
      {"ReduceMin", OpReduce},       {"ReduceProd", OpReduce},
      {"ReduceMean", OpReduce},      {"Einsum", OpEinsum},
      {"Conv", OpConv},              {"ConvTranspose", OpConvTranspose},
      {"MaxPool", OpPool},           {"AveragePool", OpPool},
  };
  return *table;
}

// ---------------------------------------------------------------------
// Load-time layout propagation.
//
// The exporter keeps the graph in NHWC and sandwiches every Conv/Pool
// (NCHW-native ops) between Transpose(0,3,1,2) / Transpose(0,2,3,1)
// pairs. The elementwise middle (BN folds, ReLU6 clips, residual adds,
// SE scales) is layout-agnostic, so whole regions between sandwiches
// can carry NCHW instead — deleting BOTH transposes of each bridge.
// This is the layout pass every interpreter engine ships (the
// reference's MNN app runs NC4HW4 end-to-end for the same reason).
//
// A tensor is relabeled NCHW iff its producer is a to-NHWC transpose or
// a relabeled flexible node, AND every consumer is a to-NCHW transpose
// or a relabeled flexible node (fixpoint shrink). Flexible = rank-4
// elementwise chains whose initializer operands are channel vectors or
// scalars (re-laid out for free: only the last dim is non-1, so
// (1,1,1,C)->(1,C,1,1) is a dims change on the same buffer), plus
// Concat/Reduce(keepdims) with their axes remapped 0,1,2,3 -> 0,2,3,1.
// Graph inputs/outputs stay NHWC. Everything else pins its region out,
// conservatively keeping its sandwiches.
// ---------------------------------------------------------------------

bool IsPerm(const pb::NodeProto& n, const std::vector<int64_t>& p) {
  return n.op_type() == "Transpose" && AttrInts(n, "perm") == p;
}

int OptimizeLayout(pb::GraphProto* g,
                   std::unordered_map<std::string, Tensor>* weights,
                   const std::unordered_set<std::string>& pinned) {
  const int n_nodes = g->node_size();
  std::unordered_map<std::string, int> producer;
  std::unordered_map<std::string, std::vector<int>> consumers;
  for (int i = 0; i < n_nodes; ++i) {
    const auto& n = g->node(i);
    for (const auto& o : n.output()) producer[o] = i;
    for (const auto& in : n.input())
      if (!weights->count(in)) consumers[in].push_back(i);
  }
  static const std::unordered_set<std::string>* kFlex =
      new std::unordered_set<std::string>{
          "Add", "Sub", "Mul", "Div", "Max", "Min", "Exp", "Sqrt",
          "Reciprocal", "Sigmoid", "Erf", "Tanh", "Identity",
          "Concat", "ReduceSum", "ReduceMax", "ReduceMin", "ReduceMean",
          "ReduceProd"};
  auto to_nchw = [&](int i) { return IsPerm(g->node(i), {0, 3, 1, 2}); };
  auto to_nhwc = [&](int i) { return IsPerm(g->node(i), {0, 2, 3, 1}); };

  // static node eligibility
  std::vector<bool> node_nchw(n_nodes, false);
  for (int i = 0; i < n_nodes; ++i) {
    const auto& n = g->node(i);
    if (!kFlex->count(n.op_type())) continue;
    bool ok = true;
    if (n.op_type().rfind("Reduce", 0) == 0 &&
        AttrInt(n, "keepdims", 1) != 1)
      ok = false;
    for (int a = 0; a < n.input_size() && ok; ++a) {
      auto wit = weights->find(n.input(a));
      if (wit == weights->end()) continue;  // tensor operand
      if (n.op_type() == "ReduceSum" && a == 1) continue;  // axes input
      const Tensor& w = wit->second;
      if (w.dt != DT::F32) ok = false;
      // free re-layout needs all dims 1 except possibly the last
      for (size_t d = 0; ok && d + 1 < w.dims.size(); ++d)
        if (w.dims[d] != 1) ok = false;
    }
    node_nchw[i] = ok;
  }

  // fixpoint shrink over tensor candidacy
  std::unordered_map<std::string, bool> cand;
  for (auto& kv : producer)
    if (!pinned.count(kv.first)) cand[kv.first] = true;
  bool changed = true;
  while (changed) {
    changed = false;
    for (int i = 0; i < n_nodes; ++i) {
      if (!node_nchw[i]) continue;
      const auto& n = g->node(i);
      bool ok = true;
      for (const auto& in : n.input()) {
        if (weights->count(in)) continue;
        auto it = cand.find(in);
        if (it == cand.end() || !it->second) {  // incl. the graph input
          ok = false;
          break;
        }
      }
      if (ok) {
        auto it = cand.find(n.output(0));
        ok = it != cand.end() && it->second;
      }
      if (!ok) {
        node_nchw[i] = false;
        changed = true;
      }
    }
    for (auto& kv : cand) {
      if (!kv.second) continue;
      int p = producer.at(kv.first);
      bool ok = to_nhwc(p) || node_nchw[p];
      if (ok)
        for (int c : consumers[kv.first])
          if (!to_nchw(c) && !node_nchw[c]) {
            ok = false;
            break;
          }
      if (!ok) {
        kv.second = false;
        changed = true;
      }
    }
  }

  // drop bridge transposes whose tensor was relabeled
  int removed = 0;
  std::unordered_map<std::string, std::string> alias;
  std::vector<bool> drop(n_nodes, false);
  for (int i = 0; i < n_nodes; ++i) {
    const auto& n = g->node(i);
    if (to_nhwc(i)) {
      auto it = cand.find(n.output(0));
      if (it != cand.end() && it->second) {
        alias[n.output(0)] = n.input(0);  // name now carries NCHW
        drop[i] = true;
        ++removed;
      }
    } else if (to_nchw(i)) {
      auto it = cand.find(n.input(0));
      if (it != cand.end() && it->second) {
        alias[n.output(0)] = n.input(0);
        drop[i] = true;
        ++removed;
      }
    }
  }
  if (removed == 0) return 0;
  auto resolve = [&](std::string name) {
    for (auto it = alias.find(name); it != alias.end(); it = alias.find(name))
      name = it->second;
    return name;
  };
  static const int64_t kMap[4] = {0, 2, 3, 1};  // NHWC axis -> NCHW axis
  auto remap_axis = [](int64_t v) { return kMap[v < 0 ? v + 4 : v]; };
  for (int i = 0; i < n_nodes; ++i) {
    if (drop[i]) continue;
    auto* n = g->mutable_node(i);
    for (int a = 0; a < n->input_size(); ++a)
      n->set_input(a, resolve(n->input(a)));
    if (!node_nchw[i]) continue;
    // relabeled node: re-lay out initializer operands + remap axes
    for (int a = 0; a < n->input_size(); ++a) {
      auto wit = weights->find(n->input(a));
      if (wit == weights->end()) continue;
      const Tensor& w = wit->second;
      std::string nn;
      Tensor t = w;
      if (n->op_type() == "ReduceSum" && a == 1) {
        for (auto& v : t.i) v = remap_axis(v);
        nn = n->input(a) + "/nchw_axes";
      } else {
        if (t.numel() <= 1) continue;  // scalars need no re-layout
        t.dims = {1, t.dims.back(), 1, 1};  // channel vector, same buffer
        nn = n->input(a) + "/nchw";
      }
      (*weights)[nn] = std::move(t);
      n->set_input(a, nn);
    }
    for (auto& attr : *n->mutable_attribute()) {
      if (attr.name() == "axis") attr.set_i(remap_axis(attr.i()));
      else if (attr.name() == "axes")
        for (int k = 0; k < attr.ints_size(); ++k)
          attr.set_ints(k, remap_axis(attr.ints(k)));
    }
  }
  google::protobuf::RepeatedPtrField<pb::NodeProto> kept;
  for (int i = 0; i < n_nodes; ++i)
    if (!drop[i]) kept.Add()->Swap(g->mutable_node(i));
  g->mutable_node()->Swap(&kept);
  return removed;
}

// ---------------------------------------------------------------------
// Load-time BN folding (runs AFTER OptimizeLayout so the chains are in
// NCHW with (1,C,1,1) channel-vector constants).
//
// The exporter emits BatchNorm as an affine chain after each conv:
//   Conv -> Sub(mean) -> Mul(scale) -> Add(beta)   (orders/subsets vary)
// Any run of Sub/Add/Mul/Div whose second operand is a per-out-channel
// (1,C,1,1) or scalar f32 initializer composes to y = a*conv(x) + c,
// which folds into the conv: W' = a[m]*W[m,...], bias c[m] — deleting
// three full-tensor read+write passes per conv. Standard interpreter-
// engine constant folding (TFLite/MNN both ship it).
// ---------------------------------------------------------------------

int FoldBatchNorm(pb::GraphProto* g,
                  std::unordered_map<std::string, Tensor>* weights,
                  const std::unordered_set<std::string>& pinned) {
  const int n_nodes = g->node_size();
  std::unordered_map<std::string, int> producer;
  std::unordered_map<std::string, int> n_consumers;
  std::unordered_map<std::string, int> sole_consumer;
  for (int i = 0; i < n_nodes; ++i) {
    const auto& n = g->node(i);
    for (const auto& o : n.output()) producer[o] = i;
    for (const auto& in : n.input())
      if (!weights->count(in)) {
        n_consumers[in] += 1;
        sole_consumer[in] = i;
      }
  }
  static const std::unordered_set<std::string>* kAffine =
      new std::unordered_set<std::string>{"Add", "Sub", "Mul", "Div"};
  std::vector<bool> drop(n_nodes, false);
  int folded = 0;
  for (int i = 0; i < n_nodes; ++i) {
    auto* conv = g->mutable_node(i);
    if (conv->op_type() != "Conv" || conv->input_size() != 2) continue;
    auto wit = weights->find(conv->input(1));
    if (wit == weights->end() || wit->second.dt != DT::F32) continue;
    const int64_t M = wit->second.dims.empty() ? 0 : wit->second.dims[0];
    if (M <= 0) continue;
    // walk the affine chain
    std::vector<float> scale(size_t(M), 1.f), shift(size_t(M), 0.f);
    std::vector<int> chain;
    std::string cur = conv->output(0);
    while (true) {
      // pinned names (graph outputs) must keep their producer node
      if (n_consumers[cur] != 1 || pinned.count(cur)) break;
      int j = sole_consumer[cur];
      const auto& n = g->node(j);
      if (drop[j] || !kAffine->count(n.op_type())) break;
      if (n.input_size() != 2 || n.input(0) != cur) break;
      auto cit = weights->find(n.input(1));
      if (cit == weights->end() || cit->second.dt != DT::F32) break;
      const Tensor& cw = cit->second;
      // accept (1,C,1,1) channel vectors (post-layout-pass form) and
      // scalars only — anything else may broadcast along H/W
      const bool chan = cw.dims.size() == 4 && cw.dims[0] == 1 &&
                        cw.dims[1] == M && cw.dims[2] == 1 &&
                        cw.dims[3] == 1;
      if (!chan && cw.numel() != 1) break;
      auto val = [&](int64_t m) { return chan ? cw.f[m] : cw.f[0]; };
      const std::string& op = n.op_type();
      for (int64_t m = 0; m < M; ++m) {
        if (op == "Add") shift[m] += val(m);
        else if (op == "Sub") shift[m] -= val(m);
        else if (op == "Mul") { scale[m] *= val(m); shift[m] *= val(m); }
        else { scale[m] /= val(m); shift[m] /= val(m); }
      }
      chain.push_back(j);
      cur = n.output(0);
    }
    if (chain.empty()) continue;
    // fold: W' = scale[m] * W, bias = shift
    Tensor w2 = wit->second;
    const int64_t per_m = w2.numel() / M;
    for (int64_t m = 0; m < M; ++m)
      for (int64_t k = 0; k < per_m; ++k) w2.f[m * per_m + k] *= scale[m];
    Tensor bias;
    bias.dt = DT::F32;
    bias.dims = {M};
    bias.f = shift;
    const std::string wname = conv->input(1) + "/bnfold";
    const std::string bname = conv->output(0) + "/bnfold_bias";
    (*weights)[wname] = std::move(w2);
    (*weights)[bname] = std::move(bias);
    conv->set_input(1, wname);
    conv->add_input(bname);
    conv->set_output(0, cur);  // take over the chain's final name
    for (int j : chain) drop[j] = true;
    folded += int(chain.size());
  }
  if (!folded) return 0;
  google::protobuf::RepeatedPtrField<pb::NodeProto> kept;
  for (int i = 0; i < n_nodes; ++i)
    if (!drop[i]) kept.Add()->Swap(g->mutable_node(i));
  g->mutable_node()->Swap(&kept);
  return folded;
}

// ---------------------------------------------------------------------
// Load-time clip fusion (runs AFTER FoldBatchNorm): a Conv followed by
// scalar-bound Max/Min nodes — the exporter's ReLU / ReLU6 form — takes
// the clamp into the conv's existing bias epilogue pass, deleting two
// full-tensor read+write passes per activation. The fused bounds ride
// the node as dlp_clip_lo/hi float attributes read by OpConv. Standard
// interpreter-engine fusion (TFLite's fused_activation_function,
// MNN's conv relu/relu6 flag).
// ---------------------------------------------------------------------

int FuseClip(pb::GraphProto* g,
             std::unordered_map<std::string, Tensor>* weights,
             const std::unordered_set<std::string>& pinned) {
  const int n_nodes = g->node_size();
  std::unordered_map<std::string, int> n_consumers, sole_consumer;
  for (int i = 0; i < n_nodes; ++i) {
    const auto& n = g->node(i);
    for (const auto& in : n.input())
      if (!weights->count(in)) {
        n_consumers[in] += 1;
        sole_consumer[in] = i;
      }
  }
  std::vector<bool> drop(n_nodes, false);
  int fused = 0;
  const float inf = std::numeric_limits<float>::infinity();
  for (int i = 0; i < n_nodes; ++i) {
    auto* conv = g->mutable_node(i);
    if (conv->op_type() != "Conv") continue;
    float lo = -inf, hi = inf;
    std::vector<int> chain;
    std::string cur = conv->output(0);
    while (true) {
      if (n_consumers[cur] != 1 || pinned.count(cur)) break;
      const int j = sole_consumer[cur];
      if (drop[j]) break;
      const auto& n = g->node(j);
      const std::string& op = n.op_type();
      if ((op != "Max" && op != "Min") || n.input_size() != 2) break;
      // the bound constant may sit on either side (Max/Min commute)
      const int ci = weights->count(n.input(0)) ? 0 : 1;
      if (n.input(1 - ci) != cur) break;
      auto cit = weights->find(n.input(ci));
      if (cit == weights->end() || cit->second.dt != DT::F32 ||
          cit->second.numel() != 1)
        break;
      // clamp(lo,hi) only reproduces the SEQUENTIAL Max/Min chain while
      // lo <= hi: e.g. Min(0.5) then Max(1.0) yields 1.0 unfused but
      // clamp would yield 0.5 — stop before the bounds go degenerate
      // (unreachable from the exporter's ReLU/ReLU6 patterns, but the
      // pass accepts arbitrary graphs; ADVICE r4)
      const float c = cit->second.f[0];
      if (op == "Max") {
        if (std::max(lo, c) > hi) break;
        lo = std::max(lo, c);
      } else {
        if (std::min(hi, c) < lo) break;
        hi = std::min(hi, c);
      }
      chain.push_back(j);
      cur = n.output(0);
    }
    if (chain.empty()) continue;
    auto* alo = conv->add_attribute();
    alo->set_name("dlp_clip_lo");
    alo->set_f(lo);
    auto* ahi = conv->add_attribute();
    ahi->set_name("dlp_clip_hi");
    ahi->set_f(hi);
    conv->set_output(0, cur);  // take over the chain's final name
    for (int j : chain) drop[j] = true;
    fused += int(chain.size());
  }
  if (!fused) return 0;
  google::protobuf::RepeatedPtrField<pb::NodeProto> kept;
  for (int i = 0; i < n_nodes; ++i)
    if (!drop[i]) kept.Add()->Swap(g->mutable_node(i));
  g->mutable_node()->Swap(&kept);
  return fused;
}

}  // namespace

// ---------------------------------------------------------------------
// engine
// ---------------------------------------------------------------------

struct OnnxEngine::Impl {
  pb::ModelProto model;
  std::unordered_map<std::string, Tensor> weights;
  std::string in_name, out_name;
  std::vector<int64_t> in_dims, out_dims;
  // index of the last node consuming each intermediate name
  std::unordered_map<std::string, int> last_use;
};

OnnxEngine::OnnxEngine() : impl_(new Impl) {}
OnnxEngine::~OnnxEngine() = default;

const std::vector<int64_t>& OnnxEngine::input_dims() const {
  return impl_->in_dims;
}
const std::vector<int64_t>& OnnxEngine::output_dims() const {
  return impl_->out_dims;
}
const std::string& OnnxEngine::input_name() const { return impl_->in_name; }
int OnnxEngine::node_count() const {
  return impl_->model.graph().node_size();
}

const char* OnnxEngine::GemmBackend() {
  return BlasSgemm() ? "openblas" : "portable";
}

void OnnxEngine::SetNumThreads(int n) {
  g_threads = std::max(1, n);
  BlasSgemm();  // force the dlopen so g_blas_set_threads is resolved
  if (g_blas_set_threads) g_blas_set_threads(g_threads);
}

std::unique_ptr<OnnxEngine> OnnxEngine::Load(const std::string& path,
                                             std::string* err) {
  std::unique_ptr<OnnxEngine> eng(new OnnxEngine);
  Impl& im = *eng->impl_;
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    *err = "cannot open " + path;
    return nullptr;
  }
  std::stringstream buf;
  buf << f.rdbuf();
  std::string bytes = buf.str();
  if (!im.model.ParseFromString(bytes)) {
    *err = "protobuf parse failed for " + path;
    return nullptr;
  }
  const pb::GraphProto& g = im.model.graph();
  for (const auto& t : g.initializer()) {
    Tensor w;
    if (!TensorFromProto(t, &w, err)) return nullptr;
    im.weights.emplace(t.name(), std::move(w));
  }
  // graph input = the declared input that is not an initializer
  for (const auto& vi : g.input()) {
    if (im.weights.count(vi.name())) continue;
    if (!im.in_name.empty()) {
      *err = "multiple graph inputs unsupported";
      return nullptr;
    }
    im.in_name = vi.name();
    for (const auto& d : vi.type().tensor_type().shape().dim())
      im.in_dims.push_back(d.dim_value());
  }
  if (g.output_size() < 1) {
    *err = "graph has no output";
    return nullptr;
  }
  im.out_name = g.output(0).name();
  for (const auto& d : g.output(0).type().tensor_type().shape().dim())
    im.out_dims.push_back(d.dim_value());

  // layout propagation (see OptimizeLayout above); the graph's declared
  // outputs stay NHWC. DEEPLAB_ENGINE_NO_LAYOUT_OPT=1 disables.
  {
    const char* off = std::getenv("DEEPLAB_ENGINE_NO_LAYOUT_OPT");
    if (!(off && *off && std::string(off) != "0")) {
      std::unordered_set<std::string> pinned;
      for (const auto& o : g.output()) pinned.insert(o.name());
      int removed = OptimizeLayout(im.model.mutable_graph(), &im.weights,
                                   pinned);
      if (removed && std::getenv("DEEPLAB_ENGINE_PROFILE"))
        std::fprintf(stderr, "layout pass: %d bridge transposes removed\n",
                     removed);
      const char* nofold = std::getenv("DEEPLAB_ENGINE_NO_BNFOLD");
      if (!(nofold && *nofold && std::string(nofold) != "0")) {
        int folded = FoldBatchNorm(im.model.mutable_graph(), &im.weights,
                                   pinned);
        if (folded && std::getenv("DEEPLAB_ENGINE_PROFILE"))
          std::fprintf(stderr, "bn-fold pass: %d affine nodes folded\n",
                       folded);
      }
      const char* noclip = std::getenv("DEEPLAB_ENGINE_NO_CLIPFUSE");
      if (!(noclip && *noclip && std::string(noclip) != "0")) {
        int fused = FuseClip(im.model.mutable_graph(), &im.weights,
                             pinned);
        if (fused && std::getenv("DEEPLAB_ENGINE_PROFILE"))
          std::fprintf(stderr, "clip-fuse pass: %d Max/Min nodes fused\n",
                       fused);
      }
    }
  }

  const auto& table = OpTable();
  for (int k = 0; k < g.node_size(); ++k) {
    const auto& node = g.node(k);
    if (!table.count(node.op_type())) {
      *err = "unsupported op " + node.op_type() + " (node '" + node.name() +
             "')";
      return nullptr;
    }
    for (const auto& inp : node.input())
      if (!im.weights.count(inp)) im.last_use[inp] = k;
  }
  im.last_use[im.out_name] = g.node_size();
  return eng;
}

bool OnnxEngine::Run(const float* input, const std::vector<int64_t>& in_dims,
                     std::vector<float>* out, std::vector<int64_t>* out_dims,
                     std::string* err) {
  Impl& im = *impl_;
  if (in_dims != im.in_dims) {
    *err = "input dims " + DimsStr(in_dims) + " != graph " +
           DimsStr(im.in_dims);
    return false;
  }
  std::unordered_map<std::string, Tensor> env;
  Tensor x;
  x.dt = DT::F32;
  x.dims = in_dims;
  x.f.assign(input, input + x.numel());
  env.emplace(im.in_name, std::move(x));

  const pb::GraphProto& g = im.model.graph();
  const auto& table = OpTable();
  // DEEPLAB_ENGINE_PROFILE=1: accumulate per-op-type wall time and print
  // a table to stderr after the run (diagnostic only).
  const bool profile = [] {
    const char* env = std::getenv("DEEPLAB_ENGINE_PROFILE");
    return env && *env && std::string(env) != "0";
  }();
  std::map<std::string, std::pair<double, int64_t>> prof;  // op → (ms, n)
  for (int k = 0; k < g.node_size(); ++k) {
    const auto& node = g.node(k);
    Ins ins;
    for (const auto& name : node.input()) {
      auto wit = im.weights.find(name);
      if (wit != im.weights.end()) {
        ins.push_back(&wit->second);
        continue;
      }
      auto eit = env.find(name);
      if (eit == env.end()) {
        *err = node.op_type() + ": missing input '" + name + "'";
        return false;
      }
      ins.push_back(&eit->second);
    }
    Tensor result;
    auto t0 = std::chrono::steady_clock::now();
    if (!table.at(node.op_type())(node, ins, &result, err)) return false;
    if (profile) {
      double ms = std::chrono::duration<double, std::milli>(
                      std::chrono::steady_clock::now() - t0)
                      .count();
      auto& cell = prof[node.op_type()];
      cell.first += ms;
      cell.second += 1;
      // DEEPLAB_ENGINE_PROFILE=2: per-node lines for the heavy nodes
      if (ms > 1.0 && std::getenv("DEEPLAB_ENGINE_PROFILE")[0] == '2')
        std::fprintf(stderr, "    [%3d] %-14s %6.1f ms  out%s in%s\n", k,
                     node.op_type().c_str(), ms, DimsStr(result.dims).c_str(),
                     ins.empty() ? "()" : DimsStr(ins[0]->dims).c_str());
    }
    env[node.output(0)] = std::move(result);
    // free dead intermediates
    for (const auto& name : node.input()) {
      auto lu = im.last_use.find(name);
      if (lu != im.last_use.end() && lu->second == k &&
          name != node.output(0))
        env.erase(name);
    }
  }
  if (profile) {
    std::fprintf(stderr, "engine profile (gemm=%s):\n", GemmBackend());
    double total = 0;
    for (const auto& kv : prof) total += kv.second.first;
    for (const auto& kv : prof)
      std::fprintf(stderr, "  %-14s %8.1f ms  x%-4lld (%4.1f%%)\n",
                   kv.first.c_str(), kv.second.first,
                   static_cast<long long>(kv.second.second),
                   100.0 * kv.second.first / std::max(total, 1e-9));
    std::fprintf(stderr, "  %-14s %8.1f ms\n", "TOTAL", total);
  }
  auto it = env.find(im.out_name);
  if (it == env.end()) {
    // output may be a direct initializer alias (fully-constant graph)
    auto wit = im.weights.find(im.out_name);
    if (wit == im.weights.end()) {
      *err = "output '" + im.out_name + "' was never produced";
      return false;
    }
    *out = wit->second.f;
    *out_dims = wit->second.dims;
    return true;
  }
  if (it->second.dt != DT::F32) {
    *err = "non-f32 graph output unsupported";
    return false;
  }
  *out = std::move(it->second.f);
  *out_dims = it->second.dims;
  return true;
}

}  // namespace dlp
