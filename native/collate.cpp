// Native batch collation for the host data pipeline.
//
// Packs decoded line images into the fixed-width batch canvas and fills the
// per-frame content masks — the inner loops of BatchCreator.create_batch
// (see pero_pretraining_tpu/data/batching.py, mirroring the reference's
// common/dataloader.py:68-155). Randomness (left paddings, crops) stays in
// Python; this library only does the bandwidth-bound copies, threaded across
// lines.
//
// Built as a plain shared library (no Python headers) and bound with ctypes:
//   g++ -O3 -march=native -shared -fPIC -pthread collate.cpp -o _native.so

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <functional>
#include <mutex>
#include <thread>
#include <vector>

namespace {

// Persistent worker pool: std::thread spawn costs ~100us, which would exceed
// the memcpy time of a whole batch; workers are created once and handed
// [lo, hi) ranges per call.
class Pool {
 public:
  static Pool& instance() {
    static Pool pool;
    return pool;
  }

  void run(int32_t n, int32_t num_threads, const std::function<void(int32_t, int32_t)>& fn) {
    num_threads = std::min<int32_t>(num_threads, kMaxThreads);
    if (num_threads <= 1 || n < 4) {
      fn(0, n);
      return;
    }
    ensure_workers();
    std::unique_lock<std::mutex> lock(mu_);
    fn_ = &fn;
    total_ = n;
    chunk_ = (n + num_threads - 1) / num_threads;
    // every live worker wakes once per generation and decrements; workers
    // beyond the chunk count find no range and just acknowledge
    remaining_ = kMaxThreads;
    next_ = 0;
    ++generation_;
    cv_work_.notify_all();
    cv_done_.wait(lock, [&] { return remaining_ == 0; });
    fn_ = nullptr;
  }

 private:
  static constexpr int32_t kMaxThreads = 8;

  void ensure_workers() {
    std::lock_guard<std::mutex> lock(spawn_mu_);
    if (!workers_.empty()) return;
    for (int32_t t = 0; t < kMaxThreads; ++t) {
      workers_.emplace_back([this] { worker_loop(); });
      workers_.back().detach();
    }
  }

  void worker_loop() {
    uint64_t seen = 0;
    while (true) {
      const std::function<void(int32_t, int32_t)>* fn;
      int32_t lo, hi;
      {
        std::unique_lock<std::mutex> lock(mu_);
        cv_work_.wait(lock, [&] { return generation_ != seen && fn_ != nullptr; });
        seen = generation_;
        fn = fn_;
        lo = next_;
        next_ += chunk_;
        hi = std::min(total_, lo + chunk_);
      }
      if (lo < hi) (*fn)(lo, hi);
      {
        std::lock_guard<std::mutex> lock(mu_);
        if (--remaining_ == 0) cv_done_.notify_all();
      }
    }
  }

  std::mutex mu_, spawn_mu_;
  std::condition_variable cv_work_, cv_done_;
  std::vector<std::thread> workers_;
  const std::function<void(int32_t, int32_t)>* fn_ = nullptr;
  uint64_t generation_ = 0;
  int32_t total_ = 0, chunk_ = 0, next_ = 0, remaining_ = 0;
};

}  // namespace

extern "C" {

// images:        n pointers to contiguous (height, width_i, channels) uint8
// widths:        n line widths (pixels)
// left_paddings: n left paddings (in frames of `sub` pixels)
// out_images:    (n, height, target_width, channels) uint8, pre-zeroed
// out_masks:     (n, target_width / sub) int32; 1 = content, 0 = padding
void pack_lines(const uint8_t** images, const int32_t* widths, int32_t n,
                int32_t height, int32_t channels, int32_t target_width,
                int32_t sub, const int32_t* left_paddings, uint8_t* out_images,
                int32_t* out_masks, int32_t num_threads) {
  const int64_t row_bytes_out = (int64_t)target_width * channels;
  const int64_t img_bytes_out = (int64_t)height * row_bytes_out;
  const int32_t s = target_width / sub;

  auto work = [&](int32_t lo, int32_t hi) {
    for (int32_t i = lo; i < hi; ++i) {
      const int32_t lp_px = left_paddings[i] * sub;
      const int32_t w = std::min(widths[i], target_width - lp_px);
      const int64_t row_bytes_in = (int64_t)widths[i] * channels;
      const int64_t copy_bytes = (int64_t)w * channels;
      // copy content only — the canvas comes from np.zeros, whose calloc
      // pages are already zero without ever being touched; memsetting the
      // padding ourselves would COMMIT those pages and cost more bandwidth
      // than it saves
      uint8_t* dst_base = out_images + i * img_bytes_out + (int64_t)lp_px * channels;
      const uint8_t* src_base = images[i];
      for (int32_t y = 0; y < height; ++y) {
        std::memcpy(dst_base + y * row_bytes_out, src_base + y * row_bytes_in, copy_bytes);
      }
      int32_t* mask = out_masks + (int64_t)i * s;
      const int32_t lp = left_paddings[i];
      const int32_t content_frames = (w + sub - 1) / sub;
      for (int32_t j = 0; j < s; ++j) {
        mask[j] = (j >= lp && j < lp + content_frames) ? 1 : 0;
      }
    }
  };

  if (num_threads <= 1 || n < 4) {
    work(0, n);
    return;
  }
  num_threads = std::min(num_threads, n);
  std::vector<std::thread> threads;
  const int32_t chunk = (n + num_threads - 1) / num_threads;
  for (int32_t t = 0; t < num_threads; ++t) {
    const int32_t lo = t * chunk;
    const int32_t hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back(work, lo, hi);
  }
  for (auto& th : threads) th.join();
}

// Stack per-frame label rows: out (n, s) pre-filled with fill_value; row i
// gets labels_i at offset left_paddings[i] (reference: dataloader.py:56-66).
void stack_labels(const int32_t** labels, const int32_t* lengths, int32_t n,
                  int32_t s, const int32_t* left_paddings, int32_t* out) {
  for (int32_t i = 0; i < n; ++i) {
    const int32_t lp = left_paddings[i];
    const int32_t len = std::min(lengths[i], s - lp);
    if (len > 0) {
      std::memcpy(out + (int64_t)i * s + lp, labels[i], (int64_t)len * sizeof(int32_t));
    }
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// JPEG decode (libjpeg) — the other half of the host hot path. cv2 also
// decodes in C++, but this removes the dependency for the common case and
// runs in the same persistent no-GIL pool as pack_lines.

#include <csetjmp>
#include <cstdio>

#include <jpeglib.h>

namespace {

struct JpegErr {
  jpeg_error_mgr mgr;
  std::jmp_buf jump;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  std::longjmp(err->jump, 1);
}

}  // namespace

extern "C" {

// Read dimensions without decoding. Returns 0 on success.
int32_t jpeg_dims(const uint8_t* data, int64_t len, int32_t* h, int32_t* w) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), (unsigned long)len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  *h = (int32_t)cinfo.image_height;
  *w = (int32_t)cinfo.image_width;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Decode to BGR uint8 (cv2 channel order) into out (h, w, 3), row stride
// `stride` bytes. Returns 0 on success.
int32_t jpeg_decode_bgr(const uint8_t* data, int64_t len, uint8_t* out, int64_t stride) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), (unsigned long)len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;  // swap to BGR below (portable across libjpeg builds)
  jpeg_start_decompress(&cinfo);
  const int32_t w = (int32_t)cinfo.output_width;
  std::vector<uint8_t> row((size_t)w * 3);
  uint8_t* rowp = row.data();
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* dst = out + (int64_t)cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &rowp, 1);
    for (int32_t x = 0; x < w; ++x) {  // RGB -> BGR
      dst[x * 3 + 0] = rowp[x * 3 + 2];
      dst[x * 3 + 1] = rowp[x * 3 + 1];
      dst[x * 3 + 2] = rowp[x * 3 + 0];
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Threaded batch decode using the persistent pool. oks[i] = 0 on success.
void jpeg_decode_batch(const uint8_t** datas, const int64_t* lens, int32_t n,
                       uint8_t** outs, const int64_t* strides, int32_t* oks,
                       int32_t num_threads) {
  Pool::instance().run(n, num_threads, [&](int32_t lo, int32_t hi) {
    for (int32_t i = lo; i < hi; ++i) {
      oks[i] = jpeg_decode_bgr(datas[i], lens[i], outs[i], strides[i]);
    }
  });
}

}  // extern "C"
