// bopio — native data-loading runtime for pix2pose_tpu.
//
// The reference feeds its GPU from Python: per-file PIL/skimage decodes in
// a 6-process Keras GeneratorEnqueuer (tools/3_train_pix2pose.py:204-206).
// This library is the TPU-framework equivalent of that host runtime as
// native code: a self-contained PNG decoder (zlib inflate + unfilter; 8/16
// bit gray, 8-bit RGB/RGBA, non-interlaced — exactly the BOP file types)
// and an NPY reader, driven by a persistent thread pool so a whole batch of
// images decodes in parallel into caller-provided buffers ready for device
// upload. Exposed through a plain C ABI for ctypes (no pybind11 in this
// environment).
//
// Build: make -C native   (g++ -O3 -shared -fPIC, links zlib + pthread)

#include <zlib.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// minimal PNG decoder
// ---------------------------------------------------------------------------

struct Image {
  int w = 0, h = 0, channels = 0, bitdepth = 0;
  std::vector<uint8_t> pixels;  // row-major, 16-bit stays big->host order
  bool ok = false;
  std::string err;
};

uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

Image decode_png(const uint8_t* buf, size_t len) {
  Image img;
  static const uint8_t magic[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a,
                                   '\n'};
  if (len < 8 || std::memcmp(buf, magic, 8) != 0) {
    img.err = "not a png";
    return img;
  }
  size_t pos = 8;
  int color_type = -1;
  std::vector<uint8_t> idat;
  while (pos + 8 <= len) {
    uint32_t clen = be32(buf + pos);
    const char* ctype = reinterpret_cast<const char*>(buf + pos + 4);
    const uint8_t* data = buf + pos + 8;
    if (pos + 12 + clen > len) break;
    if (std::memcmp(ctype, "IHDR", 4) == 0) {
      img.w = be32(data);
      img.h = be32(data + 4);
      img.bitdepth = data[8];
      color_type = data[9];
      if (data[12] != 0) {
        img.err = "interlaced png unsupported";
        return img;
      }
    } else if (std::memcmp(ctype, "IDAT", 4) == 0) {
      idat.insert(idat.end(), data, data + clen);
    } else if (std::memcmp(ctype, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + clen;
  }
  switch (color_type) {
    case 0: img.channels = 1; break;  // gray
    case 2: img.channels = 3; break;  // rgb
    case 4: img.channels = 2; break;  // gray+alpha
    case 6: img.channels = 4; break;  // rgba
    default:
      img.err = "palette png unsupported";
      return img;
  }
  if (img.bitdepth != 8 && img.bitdepth != 16) {
    img.err = "bitdepth unsupported";
    return img;
  }
  const int bypp = img.channels * img.bitdepth / 8;  // bytes per pixel
  const size_t stride = size_t(img.w) * bypp;
  std::vector<uint8_t> raw((stride + 1) * img.h);
  uLongf raw_len = raw.size();
  if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK ||
      raw_len != raw.size()) {
    img.err = "inflate failed";
    return img;
  }
  img.pixels.resize(stride * img.h);
  std::vector<uint8_t> prev(stride, 0);
  for (int y = 0; y < img.h; ++y) {
    const uint8_t* src = raw.data() + size_t(y) * (stride + 1);
    uint8_t filter = src[0];
    ++src;
    uint8_t* dst = img.pixels.data() + size_t(y) * stride;
    for (size_t x = 0; x < stride; ++x) {
      int a = x >= size_t(bypp) ? dst[x - bypp] : 0;
      int b = prev[x];
      int c = x >= size_t(bypp) ? prev[x - bypp] : 0;
      int v = src[x];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default:
          img.err = "bad filter";
          return img;
      }
      dst[x] = uint8_t(v);
    }
    std::memcpy(prev.data(), dst, stride);
  }
  // 16-bit: swap big-endian to host little-endian in place
  if (img.bitdepth == 16) {
    for (size_t i = 0; i + 1 < img.pixels.size(); i += 2)
      std::swap(img.pixels[i], img.pixels[i + 1]);
  }
  img.ok = true;
  return img;
}

std::vector<uint8_t> read_file(const char* path) {
  std::vector<uint8_t> out;
  FILE* f = std::fopen(path, "rb");
  if (!f) return out;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  out.resize(n);
  if (std::fread(out.data(), 1, n, f) != size_t(n)) out.clear();
  std::fclose(f);
  return out;
}

// ---------------------------------------------------------------------------
// thread pool
// ---------------------------------------------------------------------------

class Pool {
 public:
  explicit Pool(int n) {
    for (int i = 0; i < n; ++i)
      workers_.emplace_back([this] { loop(); });
  }
  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }
  void submit(std::function<void()> fn) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      q_.push(std::move(fn));
    }
    cv_.notify_one();
  }

 private:
  void loop() {
    for (;;) {
      std::function<void()> fn;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !q_.empty(); });
        if (stop_ && q_.empty()) return;
        fn = std::move(q_.front());
        q_.pop();
      }
      fn();
    }
  }
  std::mutex mu_;
  std::condition_variable cv_;
  std::queue<std::function<void()>> q_;
  std::vector<std::thread> workers_;
  bool stop_ = false;
};

Pool* pool() {
  static Pool p(std::max(2u, std::thread::hardware_concurrency()));
  return &p;
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

// Probe a PNG's shape. Returns 0 on success.
int bopio_png_info(const char* path, int* w, int* h, int* channels,
                   int* bitdepth) {
  auto buf = read_file(path);
  if (buf.size() < 33) return -1;
  if (be32(buf.data() + 8) < 13) return -2;
  *w = int(be32(buf.data() + 16));
  *h = int(be32(buf.data() + 20));
  int bd = buf[24], ct = buf[25];
  *bitdepth = bd;
  switch (ct) {
    case 0: *channels = 1; break;
    case 2: *channels = 3; break;
    case 4: *channels = 2; break;
    case 6: *channels = 4; break;
    default: return -3;
  }
  return 0;
}

// Decode one PNG into out (caller-allocated w*h*channels*(bitdepth/8)
// bytes; 16-bit output is host-endian uint16). Returns 0 on success.
int bopio_decode_png(const char* path, uint8_t* out, int64_t out_len) {
  auto buf = read_file(path);
  if (buf.empty()) return -1;
  Image img = decode_png(buf.data(), buf.size());
  if (!img.ok) return -2;
  if (int64_t(img.pixels.size()) != out_len) return -3;
  std::memcpy(out, img.pixels.data(), img.pixels.size());
  return 0;
}

// Decode a batch of PNGs in parallel. paths: array of n c-strings;
// outs: array of n output pointers; lens: expected byte counts.
// rc[i] = per-file status. Returns number of failures.
int bopio_decode_png_batch(const char** paths, uint8_t** outs,
                           const int64_t* lens, int* rc, int n) {
  std::atomic<int> remaining(n), failures(0);
  std::mutex done_mu;
  std::condition_variable done_cv;
  for (int i = 0; i < n; ++i) {
    pool()->submit([&, i] {
      rc[i] = bopio_decode_png(paths[i], outs[i], lens[i]);
      if (rc[i] != 0) failures.fetch_add(1);
      if (remaining.fetch_sub(1) == 1) {
        std::lock_guard<std::mutex> lk(done_mu);
        done_cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(done_mu);
  done_cv.wait(lk, [&] { return remaining.load() == 0; });
  return failures.load();
}

// Minimal NPY loader: C-order little-endian arrays. Fills shape (up to 4
// dims, -1 padded), dtype code (1=u8, 2=u16, 4=f32, 8=f64) and copies data
// into out if out_len matches. Two-phase: call with out=null to get sizes.
int bopio_load_npy(const char* path, int64_t* shape, int* ndim,
                   int* dtype_code, uint8_t* out, int64_t out_len) {
  auto buf = read_file(path);
  if (buf.size() < 10 || std::memcmp(buf.data(), "\x93NUMPY", 6) != 0)
    return -1;
  int major = buf[6];
  size_t hlen, data_off;
  if (major == 1) {
    hlen = buf[8] | (buf[9] << 8);
    data_off = 10 + hlen;
  } else {
    hlen = be32(buf.data() + 8);  // actually little-endian, fix below
    hlen = buf[8] | (buf[9] << 8) | (buf[10] << 16) |
           (uint32_t(buf[11]) << 24);
    data_off = 12 + hlen;
  }
  std::string header(reinterpret_cast<char*>(buf.data()) +
                         (major == 1 ? 10 : 12),
                     hlen);
  auto find = [&](const std::string& key) -> std::string {
    auto p = header.find(key);
    if (p == std::string::npos) return "";
    p = header.find(':', p);
    auto q = header.find_first_of(",}", p);
    return header.substr(p + 1, q - p - 1);
  };
  std::string descr = find("'descr'");
  int code = 0;
  if (descr.find("u1") != std::string::npos) code = 1;
  else if (descr.find("u2") != std::string::npos) code = 2;
  else if (descr.find("f4") != std::string::npos) code = 4;
  else if (descr.find("f8") != std::string::npos) code = 8;
  else return -2;
  *dtype_code = code;
  if (header.find("'fortran_order': True") != std::string::npos) return -3;
  auto p = header.find("'shape'");
  p = header.find('(', p);
  auto q = header.find(')', p);
  std::string shp = header.substr(p + 1, q - p - 1);
  int nd = 0;
  int64_t total = 1;
  size_t start = 0;
  while (start < shp.size() && nd < 4) {
    size_t comma = shp.find(',', start);
    std::string tok = shp.substr(start, comma == std::string::npos
                                            ? std::string::npos
                                            : comma - start);
    bool has_digit = tok.find_first_of("0123456789") != std::string::npos;
    if (has_digit) {
      int64_t v = std::stoll(tok);
      shape[nd++] = v;
      total *= v;
    }
    if (comma == std::string::npos) break;
    start = comma + 1;
  }
  *ndim = nd;
  int itemsize = code == 1 ? 1 : (code == 2 ? 2 : (code == 4 ? 4 : 8));
  int64_t nbytes = total * itemsize;
  if (out == nullptr) {
    shape[3] = nbytes;  // report byte count in the last slot
    return 0;
  }
  if (out_len != nbytes || buf.size() < data_off + size_t(nbytes))
    return -4;
  std::memcpy(out, buf.data() + data_off, nbytes);
  return 0;
}

}  // extern "C"
