// onnx_engine — self-contained C++ inference engine for the .onnx
// artifacts produced by deeplabv3p_tpu.export.onnx.convert.
//
// Role parity: the reference ships a SECOND native engine next to the
// TFLite app (/root/reference/inference/MNN/deeplabSegment.cpp:240-360,
// an MNN-interpreter invoke path). MNN is a proprietary runtime we can't
// link, so this engine fills that slot the way MNN itself does it — a
// small standalone operator interpreter over the project's exported
// model format. It executes the exporter's full opset-13 subset (the op
// superset across every registry model family, measured: Conv,
// ConvTranspose, MaxPool, AveragePool, Einsum, elementwise, reductions,
// shape ops) with zero Python / zero TensorFlow at runtime.
//
// Scope: inference graphs from our own exporter — static shapes, f32
// compute, initializer weights. Unknown ops fail loudly by name.

#ifndef DEEPLABV3P_TPU_INFERENCE_ONNX_ENGINE_H_
#define DEEPLABV3P_TPU_INFERENCE_ONNX_ENGINE_H_

#include <cstdint>
#include <memory>
#include <string>
#include <vector>

namespace dlp {

class OnnxEngine {
 public:
  // Parses the serialized ModelProto at `path`. Returns nullptr and sets
  // *err on parse failure or if the graph uses an unsupported op.
  static std::unique_ptr<OnnxEngine> Load(const std::string& path,
                                          std::string* err);
  ~OnnxEngine();

  // Runs the graph on one f32 input (the exporter's single-image
  // signature). `in_dims` must match the graph input declaration.
  // On success fills `out`/`out_dims` with the first graph output.
  bool Run(const float* input, const std::vector<int64_t>& in_dims,
           std::vector<float>* out, std::vector<int64_t>* out_dims,
           std::string* err);

  // Declared graph input/output dims (from ValueInfoProto).
  const std::vector<int64_t>& input_dims() const;
  const std::vector<int64_t>& output_dims() const;
  const std::string& input_name() const;

  int node_count() const;

  // Which GEMM implementation convolutions will use: "openblas" when a
  // wheel-bundled OpenBLAS was dlopen'd (see onnx_engine.cc), else
  // "portable".
  static const char* GemmBackend();

  // Engine-wide worker thread count (the reference apps' --threads knob:
  // tflite cpp:206-208, MNN cpp:249). Applies to BLAS GEMMs (forwarded
  // to OpenBLAS when its set_num_threads export is present) and to the
  // engine's own chunked loops (elementwise, depthwise conv). Chunk
  // boundaries don't reorder any float accumulation, so results are
  // bit-identical to single-thread for the engine's own loops.
  static void SetNumThreads(int n);

 private:
  OnnxEngine();
  struct Impl;
  std::unique_ptr<Impl> impl_;
};

}  // namespace dlp

#endif  // DEEPLABV3P_TPU_INFERENCE_ONNX_ENGINE_H_
