// Native frame loader: PGM/PPM decode + background prefetch ring.
//
// The reference's frame IO is cv2.imread — OpenCV C++ — feeding the Python
// loop. This is the TPU-native framework's equivalent runtime component:
// a C++ decoder plus a pthread prefetcher that overlaps disk IO and decode
// with TPU compute, exposed to Python via ctypes (no pybind11 in this
// environment).
//
// Formats: binary PGM (P5) and PPM (P6), 8-bit, with comment support.
// Build: g++ -O2 -shared -fPIC frameloader.cpp -o libframeloader.so -lpthread

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include <atomic>
#include <condition_variable>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  std::vector<uint8_t> data;
  int w = 0, h = 0, channels = 0;
  bool ok = false;
};

// Skip whitespace and '#' comments in a PNM header.
const uint8_t* skip_ws(const uint8_t* p, const uint8_t* end) {
  while (p < end) {
    if (*p == '#') {
      while (p < end && *p != '\n') ++p;
    } else if (*p == ' ' || *p == '\t' || *p == '\r' || *p == '\n') {
      ++p;
    } else {
      break;
    }
  }
  return p;
}

const uint8_t* read_int(const uint8_t* p, const uint8_t* end, int* out) {
  p = skip_ws(p, end);
  long long v = 0;
  bool any = false;
  while (p < end && *p >= '0' && *p <= '9') {
    v = v * 10 + (*p - '0');
    if (v > 100000000) {  // no sane PNM dimension/maxval; avoid overflow
      *out = -1;
      while (p < end && *p >= '0' && *p <= '9') ++p;
      return p;
    }
    ++p;
    any = true;
  }
  *out = any ? static_cast<int>(v) : -1;
  return p;
}

Image decode_pnm(const uint8_t* buf, size_t len) {
  Image img;
  const uint8_t* end = buf + len;
  if (len < 10 || buf[0] != 'P') return img;
  int channels;
  if (buf[1] == '5') {
    channels = 1;
  } else if (buf[1] == '6') {
    channels = 3;
  } else {
    return img;
  }
  const uint8_t* p = buf + 2;
  int w, h, maxval;
  p = read_int(p, end, &w);
  p = read_int(p, end, &h);
  p = read_int(p, end, &maxval);
  if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255 || p >= end) return img;
  ++p;  // single whitespace after maxval
  size_t need = static_cast<size_t>(w) * h * channels;
  if (static_cast<size_t>(end - p) < need) return img;
  img.data.assign(p, p + need);
  img.w = w;
  img.h = h;
  img.channels = channels;
  img.ok = true;
  return img;
}

Image load_file(const char* path) {
  Image img;
  FILE* f = std::fopen(path, "rb");
  if (!f) return img;
  std::fseek(f, 0, SEEK_END);
  long sz = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (sz <= 0) {
    std::fclose(f);
    return img;
  }
  std::vector<uint8_t> buf(static_cast<size_t>(sz));
  size_t rd = std::fread(buf.data(), 1, buf.size(), f);
  std::fclose(f);
  if (rd != buf.size()) return img;
  return decode_pnm(buf.data(), buf.size());
}

struct Loader {
  std::vector<std::string> paths;
  size_t ring_capacity;
  std::vector<Image> ring;
  size_t head = 0;  // next slot to consume
  size_t count = 0; // filled slots
  size_t produced = 0;
  std::mutex mu;
  std::condition_variable cv_space, cv_data;
  std::thread worker;
  std::atomic<bool> stop{false};

  Loader(std::vector<std::string> p, size_t cap)
      : paths(std::move(p)), ring_capacity(cap), ring(cap) {
    worker = std::thread([this] { run(); });
  }

  ~Loader() {
    stop.store(true);
    cv_space.notify_all();
    if (worker.joinable()) worker.join();
  }

  void run() {
    for (size_t i = 0; i < paths.size() && !stop.load(); ++i) {
      Image img = load_file(paths[i].c_str());
      std::unique_lock<std::mutex> lk(mu);
      cv_space.wait(lk, [this] {
        return count < ring_capacity || stop.load();
      });
      if (stop.load()) return;
      ring[(head + count) % ring_capacity] = std::move(img);
      ++count;
      ++produced;
      cv_data.notify_one();
    }
  }

  // Returns: 1 ok, 0 decode failure, -1 end of stream.
  int next(uint8_t* out, int* w, int* h, int* channels, size_t out_cap) {
    std::unique_lock<std::mutex> lk(mu);
    cv_data.wait(lk, [this] {
      return count > 0 || produced == paths.size();
    });
    if (count == 0) return -1;
    Image img = std::move(ring[head]);
    head = (head + 1) % ring_capacity;
    --count;
    cv_space.notify_one();
    lk.unlock();
    if (!img.ok) return 0;
    *w = img.w;
    *h = img.h;
    *channels = img.channels;
    if (img.data.size() > out_cap) return 0;
    std::memcpy(out, img.data.data(), img.data.size());
    return 1;
  }
};

}  // namespace

extern "C" {

void* loader_create(const char** paths, int n, int ring_capacity) {
  std::vector<std::string> p(paths, paths + n);
  if (ring_capacity < 1) ring_capacity = 1;  // ring(0) would modulo-by-zero
  return new Loader(std::move(p), static_cast<size_t>(ring_capacity));
}

int loader_next(void* handle, uint8_t* out, long out_cap, int* w, int* h,
                int* channels) {
  return static_cast<Loader*>(handle)->next(out, w, h, channels,
                                            static_cast<size_t>(out_cap));
}

void loader_destroy(void* handle) { delete static_cast<Loader*>(handle); }

int decode_pnm_buffer(const uint8_t* buf, long len, uint8_t* out,
                      long out_cap, int* w, int* h, int* channels) {
  Image img = decode_pnm(buf, static_cast<size_t>(len));
  if (!img.ok || static_cast<long>(img.data.size()) > out_cap) return 0;
  *w = img.w;
  *h = img.h;
  *channels = img.channels;
  std::memcpy(out, img.data.data(), img.data.size());
  return 1;
}

}  // extern "C"
