// deeplabSegment — native on-device segmentation CLI.
//
// TPU-native counterpart of the reference's TFLite/MNN apps
// (/root/reference/inference/tflite/deeplabSegment.cpp:178-515,
// /root/reference/inference/MNN/deeplabSegment.cpp): identical
// responsibilities and output semantics —
//   * decode the input image (system libjpeg/libpng instead of vendored
//     stb — a deliberate design change),
//   * bilinear-resize to the model input shape and fill a normalized
//     [-1, 1] float buffer (reference fill_data, tflite cpp:162-175),
//   * warmup + timed invoke loop (tflite cpp:307-323),
//   * per-pixel argmax over (H, W, C) class scores (deeplab_postprocess,
//     tflite cpp:56-116) — done natively here, vectorizable hot loop,
//   * nearest-neighbour mask resize back to the original size
//     (mask_resize, tflite cpp:138-159),
//   * write the class-index mask PNG + report detected classes
//     (tflite cpp:387-395).
//
// Model execution: two engines, selected by --engine (reference ships
// two apps — TFLite and MNN — for the same reason):
//   * python (default for .shlo/.ckpt): embeds CPython and drives the
//     XLA-compiled model through deeplabv3p_tpu.runtime.Runner — on a
//     TPU host the invoke runs on the TPU.
//   * onnx (default for .onnx): the in-tree pure-C++ interpreter over
//     the exporter's opset subset (onnx_engine.cc) — zero Python, zero
//     TensorFlow at runtime, the MNN-app execution model.

#include <Python.h>

#include <getopt.h>
#include <jpeglib.h>
#include <png.h>

#include <chrono>
#include <cmath>
#include <csetjmp>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <set>
#include <string>
#include <vector>

#include "onnx_engine.h"

namespace {

struct Image {
  int width = 0;
  int height = 0;
  int channels = 0;
  std::vector<unsigned char> data;  // interleaved, row-major
};

double NowMs() {
  return std::chrono::duration<double, std::milli>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}

// ---------------------------------------------------------------------------
// image IO (libjpeg / libpng)
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void JpegErrorExit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

bool LoadJpeg(const std::string& path, Image* out) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = JpegErrorExit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->width = cinfo.output_width;
  out->height = cinfo.output_height;
  out->channels = 3;
  out->data.resize(size_t(out->width) * out->height * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row =
        out->data.data() + size_t(cinfo.output_scanline) * out->width * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

bool LoadPng(const std::string& path, Image* out) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_set_expand(png);
  png_set_strip_16(png);
  png_set_palette_to_rgb(png);
  if (png_get_color_type(png, info) == PNG_COLOR_TYPE_GRAY)
    png_set_gray_to_rgb(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);
  out->width = png_get_image_width(png, info);
  out->height = png_get_image_height(png, info);
  out->channels = 3;
  out->data.resize(size_t(out->width) * out->height * 3);
  std::vector<png_bytep> rows(out->height);
  for (int y = 0; y < out->height; ++y)
    rows[y] = out->data.data() + size_t(y) * out->width * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  return true;
}

bool LoadImage(const std::string& path, Image* out) {
  auto dot = path.find_last_of('.');
  std::string ext = dot == std::string::npos ? "" : path.substr(dot + 1);
  for (auto& c : ext) c = tolower(c);
  if (ext == "png") return LoadPng(path, out);
  return LoadJpeg(path, out);
}

bool SaveGrayPng(const std::string& path, const unsigned char* data, int width,
                 int height) {
  FILE* f = fopen(path.c_str(), "wb");
  if (!f) return false;
  png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                            nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_write_struct(&png, &info);
    fclose(f);
    return false;
  }
  png_init_io(png, f);
  png_set_IHDR(png, info, width, height, 8, PNG_COLOR_TYPE_GRAY,
               PNG_INTERLACE_NONE, PNG_COMPRESSION_TYPE_DEFAULT,
               PNG_FILTER_TYPE_DEFAULT);
  png_write_info(png, info);
  for (int y = 0; y < height; ++y)
    png_write_row(png, const_cast<unsigned char*>(data + size_t(y) * width));
  png_write_end(png, nullptr);
  png_destroy_write_struct(&png, &info);
  fclose(f);
  return true;
}

// ---------------------------------------------------------------------------
// native pre/post processing
// ---------------------------------------------------------------------------

// Bilinear u8 resize (half-pixel centers), replacing the reference's
// stbir_resize_uint8 (tflite cpp:281).
void ResizeBilinear(const Image& src, int dst_w, int dst_h,
                    std::vector<unsigned char>* dst) {
  dst->resize(size_t(dst_w) * dst_h * 3);
  const float sx = float(src.width) / dst_w;
  const float sy = float(src.height) / dst_h;
  for (int y = 0; y < dst_h; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = std::max(0, int(std::floor(fy)));
    int y1 = std::min(src.height - 1, y0 + 1);
    float wy = fy - std::floor(fy);
    if (fy < 0) wy = 0;
    for (int x = 0; x < dst_w; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = std::max(0, int(std::floor(fx)));
      int x1 = std::min(src.width - 1, x0 + 1);
      float wx = fx - std::floor(fx);
      if (fx < 0) wx = 0;
      for (int c = 0; c < 3; ++c) {
        float v00 = src.data[(size_t(y0) * src.width + x0) * 3 + c];
        float v01 = src.data[(size_t(y0) * src.width + x1) * 3 + c];
        float v10 = src.data[(size_t(y1) * src.width + x0) * 3 + c];
        float v11 = src.data[(size_t(y1) * src.width + x1) * 3 + c];
        float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                  v10 * wy * (1 - wx) + v11 * wy * wx;
        (*dst)[(size_t(y) * dst_w + x) * 3 + c] =
            (unsigned char)(v + 0.5f);
      }
    }
  }
}

// Normalized fill: (px - mean) / std with the reference's defaults
// mean=127.5 std=127.5 → [-1, 1] (tflite cpp:162-175).
void FillNormalized(const std::vector<unsigned char>& src, float mean,
                    float stddev, std::vector<float>* dst) {
  dst->resize(src.size());
  const float inv = 1.0f / stddev;
  for (size_t i = 0; i < src.size(); ++i)
    (*dst)[i] = (float(src[i]) - mean) * inv;
}

// Per-pixel argmax over NHWC class scores (reference deeplab_postprocess,
// tflite cpp:56-116).
void ArgmaxMask(const float* probs, int h, int w, int classes,
                std::vector<unsigned char>* mask,
                std::set<int>* found_classes) {
  mask->resize(size_t(h) * w);
  for (int i = 0; i < h * w; ++i) {
    const float* row = probs + size_t(i) * classes;
    int best = 0;
    float best_v = row[0];
    for (int c = 1; c < classes; ++c)
      if (row[c] > best_v) {
        best_v = row[c];
        best = c;
      }
    (*mask)[i] = (unsigned char)best;
    found_classes->insert(best);
  }
}

// Nearest mask resize, cv2 convention src = floor(dst * scale)
// (reference mask_resize, tflite cpp:138-159).
void MaskResizeNearest(const std::vector<unsigned char>& src, int src_w,
                       int src_h, int dst_w, int dst_h,
                       std::vector<unsigned char>* dst) {
  dst->resize(size_t(dst_w) * dst_h);
  for (int y = 0; y < dst_h; ++y) {
    int sy = std::min(src_h - 1, y * src_h / dst_h);
    for (int x = 0; x < dst_w; ++x) {
      int sx = std::min(src_w - 1, x * src_w / dst_w);
      (*dst)[size_t(y) * dst_w + x] = src[size_t(sy) * src_w + sx];
    }
  }
}

// ---------------------------------------------------------------------------
// embedded-Python model runner
// ---------------------------------------------------------------------------

struct Runner {
  PyObject* runner = nullptr;

  bool Init(const std::string& model_path, const std::string& model_type,
            int num_classes, int in_h, int in_w) {
    PyObject* mod = PyImport_ImportModule("deeplabv3p_tpu.runtime");
    if (!mod) {
      PyErr_Print();
      return false;
    }
    PyObject* cls = PyObject_GetAttrString(mod, "Runner");
    Py_DECREF(mod);
    if (!cls) {
      PyErr_Print();
      return false;
    }
    runner = PyObject_CallFunction(cls, "ssiii", model_path.c_str(),
                                   model_type.c_str(), num_classes, in_h,
                                   in_w);
    Py_DECREF(cls);
    if (!runner) {
      PyErr_Print();
      return false;
    }
    return true;
  }

  // Runs the model; returns probs buffer + dims.
  bool Invoke(const std::vector<float>& input, int h, int w,
              std::vector<float>* probs, int* out_h, int* out_w,
              int* out_c) {
    PyObject* bytes = PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(input.data()),
        input.size() * sizeof(float));
    PyObject* result = PyObject_CallMethod(runner, "run_bytes", "Oiii", bytes,
                                           1, h, w);
    Py_DECREF(bytes);
    if (!result) {
      PyErr_Print();
      return false;
    }
    PyObject* data_obj;
    if (!PyArg_ParseTuple(result, "Siii", &data_obj, out_h, out_w, out_c)) {
      Py_DECREF(result);
      return false;
    }
    char* buf;
    Py_ssize_t len;
    PyBytes_AsStringAndSize(data_obj, &buf, &len);
    probs->resize(len / sizeof(float));
    std::memcpy(probs->data(), buf, len);
    Py_DECREF(result);
    return true;
  }
};

void Usage(const char* prog) {
  std::fprintf(
      stderr,
      "Usage: %s --model_path M --image I [options]\n"
      "  --model_path PATH   .shlo artifact, .ckpt checkpoint or .onnx\n"
      "  --model_type NAME   model type for .ckpt (default mobilenetv2_lite)\n"
      "  --engine NAME       auto|python|onnx (default auto: onnx for\n"
      "                      .onnx models, python otherwise)\n"
      "  --image PATH        input image (jpg/png)\n"
      "  --classes NUM       class count (default 21)\n"
      "  --input_shape HxW   model input (default 512x512)\n"
      "  --count N           timed invoke loop count (default 1)\n"
      "  --warmup_runs N     warmup invokes (default 1)\n"
      "  --threads N         worker threads, onnx engine only (default 1)\n"
      "  --input_mean F      normalization mean (default 127.5)\n"
      "  --input_std F       normalization std (default 127.5)\n"
      "  --output PATH       mask PNG out (default <image>_mask.png)\n"
      "  --keep_shape        skip resize of mask back to original size\n"
      "  --dump_raw PATH     also write the raw f32 score tensor (NHWC)\n"
      "                      for cross-engine validation\n"
      "  --input_raw PATH    read the preprocessed f32 NHWC input tensor\n"
      "                      directly (bit-exact cross-engine validation;\n"
      "                      --image becomes optional and the mask stays\n"
      "                      at model resolution)\n",
      prog);
}

}  // namespace

int main(int argc, char** argv) {
  std::string model_path, image_path, output_path;
  std::string model_type = "mobilenetv2_lite";
  std::string engine = "auto";
  std::string dump_raw, input_raw;
  int num_classes = 21, in_h = 512, in_w = 512;
  int count = 1, warmup = 1, threads = 1;
  float input_mean = 127.5f, input_std = 127.5f;
  bool keep_shape = false;

  static option opts[] = {
      {"model_path", required_argument, nullptr, 'm'},
      {"model_type", required_argument, nullptr, 't'},
      {"engine", required_argument, nullptr, 'e'},
      {"image", required_argument, nullptr, 'i'},
      {"classes", required_argument, nullptr, 'c'},
      {"input_shape", required_argument, nullptr, 's'},
      {"count", required_argument, nullptr, 'n'},
      {"warmup_runs", required_argument, nullptr, 'w'},
      {"threads", required_argument, nullptr, 'T'},
      {"input_mean", required_argument, nullptr, 'b'},
      {"input_std", required_argument, nullptr, 'd'},
      {"output", required_argument, nullptr, 'o'},
      {"keep_shape", no_argument, nullptr, 'k'},
      {"dump_raw", required_argument, nullptr, 'r'},
      {"input_raw", required_argument, nullptr, 'R'},
      {"help", no_argument, nullptr, 'h'},
      {nullptr, 0, nullptr, 0}};
  int opt;
  while ((opt = getopt_long(argc, argv, "m:t:e:i:c:s:n:w:T:b:d:o:kr:R:h",
                            opts, nullptr)) != -1) {
    switch (opt) {
      case 'm': model_path = optarg; break;
      case 't': model_type = optarg; break;
      case 'e': engine = optarg; break;
      case 'i': image_path = optarg; break;
      case 'c': num_classes = atoi(optarg); break;
      case 's': sscanf(optarg, "%dx%d", &in_h, &in_w); break;
      case 'n': count = atoi(optarg); break;
      case 'w': warmup = atoi(optarg); break;
      case 'T': threads = atoi(optarg); break;
      case 'b': input_mean = float(atof(optarg)); break;
      case 'd': input_std = float(atof(optarg)); break;
      case 'o': output_path = optarg; break;
      case 'k': keep_shape = true; break;
      case 'r': dump_raw = optarg; break;
      case 'R': input_raw = optarg; break;
      default: Usage(argv[0]); return 1;
    }
  }
  if (model_path.empty() || (image_path.empty() && input_raw.empty())) {
    Usage(argv[0]);
    return 1;
  }
  if (!input_raw.empty()) keep_shape = true;  // no origin size to restore
  if (engine == "auto") {
    auto dot = model_path.find_last_of('.');
    engine = (dot != std::string::npos && model_path.substr(dot) == ".onnx")
                 ? "onnx"
                 : "python";
  }
  if (engine != "python" && engine != "onnx") {
    std::fprintf(stderr, "unknown --engine '%s'\n", engine.c_str());
    return 1;
  }
  if (output_path.empty()) {
    const std::string& base = image_path.empty() ? input_raw : image_path;
    auto dot = base.find_last_of('.');
    output_path = base.substr(0, dot) + "_mask.png";
  }

  // load + preprocess (native), or take the ready f32 tensor
  Image img;
  std::vector<unsigned char> resized;
  std::vector<float> input;
  double t0 = NowMs();
  if (!input_raw.empty()) {
    FILE* rf = fopen(input_raw.c_str(), "rb");
    if (!rf) {
      std::fprintf(stderr, "failed to open %s\n", input_raw.c_str());
      return 1;
    }
    input.resize(size_t(in_h) * in_w * 3);
    size_t got = fread(input.data(), sizeof(float), input.size(), rf);
    fclose(rf);
    if (got != input.size()) {
      std::fprintf(stderr, "%s: expected %zu f32 values, got %zu\n",
                   input_raw.c_str(), input.size(), got);
      return 1;
    }
  } else {
    if (!LoadImage(image_path, &img)) {
      std::fprintf(stderr, "failed to load %s\n", image_path.c_str());
      return 1;
    }
    std::printf("origin image size: width:%d, height:%d, channel:%d\n",
                img.width, img.height, img.channels);
    t0 = NowMs();
    ResizeBilinear(img, in_w, in_h, &resized);
    FillNormalized(resized, input_mean, input_std, &input);
    std::printf("preprocess time: %.3f ms\n", NowMs() - t0);
  }

  std::vector<float> probs;
  int oh = 0, ow = 0, oc = 0;
  bool py_inited = false;

  if (engine == "onnx") {
    // pure-C++ engine: no Python at runtime
    dlp::OnnxEngine::SetNumThreads(threads);
    std::string err;
    auto eng = dlp::OnnxEngine::Load(model_path, &err);
    if (!eng) {
      std::fprintf(stderr, "onnx engine: %s\n", err.c_str());
      return 1;
    }
    const auto& gd = eng->input_dims();  // NHWC (1,H,W,3) from exporter
    if (gd.size() == 4 && (gd[1] != in_h || gd[2] != in_w)) {
      if (!input_raw.empty()) {
        std::fprintf(stderr,
                     "graph input %lldx%lld != --input_shape %dx%d "
                     "(raw input cannot be resized)\n",
                     (long long)gd[1], (long long)gd[2], in_h, in_w);
        return 1;
      }
      std::printf("note: graph input %lldx%lld overrides --input_shape\n",
                  (long long)gd[1], (long long)gd[2]);
      in_h = int(gd[1]);
      in_w = int(gd[2]);
      ResizeBilinear(img, in_w, in_h, &resized);
      FillNormalized(resized, input_mean, input_std, &input);
    }
    std::printf("onnx graph loaded: %d nodes (gemm=%s, threads=%d)\n",
                eng->node_count(), dlp::OnnxEngine::GemmBackend(), threads);
    std::vector<int64_t> in_dims = {1, in_h, in_w, 3};
    std::vector<int64_t> out_dims;
    auto invoke = [&]() {
      if (!eng->Run(input.data(), in_dims, &probs, &out_dims, &err)) {
        std::fprintf(stderr, "onnx engine: %s\n", err.c_str());
        return false;
      }
      return true;
    };
    for (int i = 0; i < warmup; ++i)
      if (!invoke()) return 1;
    t0 = NowMs();
    for (int i = 0; i < count; ++i)
      if (!invoke()) return 1;
    double invoke_ms = (NowMs() - t0) / std::max(count, 1);
    std::printf("model invoke average time: %.3f ms\n", invoke_ms);
    if (out_dims.size() != 4) {
      std::fprintf(stderr, "unexpected output rank %zu\n", out_dims.size());
      return 1;
    }
    oh = int(out_dims[1]);
    ow = int(out_dims[2]);
    oc = int(out_dims[3]);
  } else {
    // embedded python → XLA
    Py_Initialize();
    py_inited = true;
    Runner runner;
    if (!runner.Init(model_path, model_type, num_classes, in_h, in_w)) {
      Py_Finalize();
      return 1;
    }
    for (int i = 0; i < warmup; ++i)
      runner.Invoke(input, in_h, in_w, &probs, &oh, &ow, &oc);

    t0 = NowMs();
    for (int i = 0; i < count; ++i)
      runner.Invoke(input, in_h, in_w, &probs, &oh, &ow, &oc);
    double invoke_ms = (NowMs() - t0) / std::max(count, 1);
    std::printf("model invoke average time: %.3f ms\n", invoke_ms);
  }

  if (!dump_raw.empty()) {
    FILE* rf = fopen(dump_raw.c_str(), "wb");
    if (rf) {
      fwrite(probs.data(), sizeof(float), probs.size(), rf);
      fclose(rf);
    }
  }

  // postprocess (native argmax)
  t0 = NowMs();
  std::vector<unsigned char> mask;
  std::set<int> found;
  ArgmaxMask(probs.data(), oh, ow, oc, &mask, &found);
  std::printf("deeplab_postprocess time: %.3f ms\n", NowMs() - t0);

  std::vector<unsigned char> final_mask;
  int out_w = ow, out_h = oh;
  if (!keep_shape) {
    t0 = NowMs();
    MaskResizeNearest(mask, ow, oh, img.width, img.height, &final_mask);
    out_w = img.width;
    out_h = img.height;
    std::printf("mask_resize time: %.3f ms\n", NowMs() - t0);
  } else {
    final_mask = mask;
  }

  std::printf("Segment class:\n");
  for (int c : found) std::printf("%d\n", c);

  bool saved = SaveGrayPng(output_path, final_mask.data(), out_w, out_h);
  if (py_inited) Py_Finalize();
  if (!saved) {
    std::fprintf(stderr, "failed to write %s\n", output_path.c_str());
    return 1;
  }
  std::printf("Segmentation result has been saved to: %s\n",
              output_path.c_str());
  return 0;
}
