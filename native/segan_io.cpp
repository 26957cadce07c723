// segan_io: native host-side audio batch engine for the SEGAN-TPU data pipeline.
//
// The reference's data path (torch DataLoader worker processes re-reading wavs per slice,
// ref se_dataset.py:334-349) is replaced here by a C++ thread pool that decodes 16-bit
// PCM WAV files, applies the reference's normalize -> pre-emphasis chain
// (se_dataset.py:108-117) and gathers fixed-size zero-padded slices directly into the
// caller's pinned batch buffer — no Python in the per-sample inner loop, no GIL.
//
// Exposed as a C ABI for ctypes (see segan_pytorch_tpu/data/native.py).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libsegan_io.so segan_io.cpp -lpthread

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <functional>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

// ----------------------------------------------------------------------------
// Minimal RIFF/WAVE PCM16 reader.
// ----------------------------------------------------------------------------
struct Wav {
  std::vector<float> samples;  // normalized+pre-emphasized float32
  uint32_t rate = 0;
  bool ok = false;
};

bool read_wav_pcm16(const std::string& path, std::vector<int16_t>* out,
                    uint32_t* rate, uint16_t* channels) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  f.seekg(0, std::ios::end);
  const int64_t file_size = static_cast<int64_t>(f.tellg());
  f.seekg(0, std::ios::beg);
  char riff[4], wave[4];
  uint32_t riff_size;
  f.read(riff, 4);
  f.read(reinterpret_cast<char*>(&riff_size), 4);
  f.read(wave, 4);
  if (!f || std::memcmp(riff, "RIFF", 4) || std::memcmp(wave, "WAVE", 4))
    return false;
  uint16_t audio_fmt = 0, nch = 0, bits = 0;
  uint32_t sample_rate = 0;
  bool have_fmt = false;
  while (f) {
    char id[4];
    uint32_t size;
    f.read(id, 4);
    f.read(reinterpret_cast<char*>(&size), 4);
    if (!f) break;
    // corrupt headers must fail cleanly, not allocate gigabytes
    if (static_cast<int64_t>(size) > file_size) return false;
    if (!std::memcmp(id, "fmt ", 4)) {
      std::vector<char> buf(size);
      f.read(buf.data(), size);
      if (size < 16) return false;
      std::memcpy(&audio_fmt, buf.data() + 0, 2);
      std::memcpy(&nch, buf.data() + 2, 2);
      std::memcpy(&sample_rate, buf.data() + 4, 4);
      std::memcpy(&bits, buf.data() + 14, 2);
      have_fmt = true;
    } else if (!std::memcmp(id, "data", 4)) {
      if (!have_fmt || audio_fmt != 1 || bits != 16) return false;
      size_t n = size / 2;
      out->resize(n);
      f.read(reinterpret_cast<char*>(out->data()), size);
      *rate = sample_rate;
      *channels = nch;
      return static_cast<bool>(f);
    } else {
      f.seekg(size + (size & 1), std::ios::cur);  // chunks are word-aligned
    }
  }
  return false;
}

// normalize_wave_minmax (ref se_dataset.py:108-109) then pre_emphasize (:111-117)
void normalize_preemph(const std::vector<int16_t>& pcm, float preemph,
                       std::vector<float>* out) {
  const size_t n = pcm.size();
  out->resize(n);
  if (n == 0) return;
  const float scale = 2.0f / 65535.0f;
  const float offset = 1.0f - 32767.0f * scale;
  float prev = pcm[0] * scale + offset;
  (*out)[0] = prev;
  if (preemph <= 0.f) {
    for (size_t i = 1; i < n; ++i) (*out)[i] = pcm[i] * scale + offset;
    return;
  }
  for (size_t i = 1; i < n; ++i) {
    const float cur = pcm[i] * scale + offset;
    (*out)[i] = cur - preemph * prev;
    prev = cur;
  }
}

// ----------------------------------------------------------------------------
// Thread pool
// ----------------------------------------------------------------------------
class ThreadPool {
 public:
  explicit ThreadPool(int n) : stop_(false) {
    for (int i = 0; i < n; ++i)
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> job;
          {
            std::unique_lock<std::mutex> lk(mu_);
            cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
            if (stop_ && jobs_.empty()) return;
            job = std::move(jobs_.front());
            jobs_.pop();
          }
          job();
        }
      });
  }
  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }
  void submit(std::function<void()> job) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      jobs_.push(std::move(job));
    }
    cv_.notify_one();
  }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> jobs_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_;
};

// ----------------------------------------------------------------------------
// Engine: wav cache + batch slice gather
// ----------------------------------------------------------------------------
struct Engine {
  explicit Engine(int threads, int cache_cap)
      : pool(threads > 0 ? threads : std::thread::hardware_concurrency()),
        cache_cap(cache_cap) {}
  ThreadPool pool;
  std::mutex cache_mu;
  std::unordered_map<std::string, std::shared_ptr<Wav>> cache;
  std::vector<std::string> cache_order;
  size_t cache_cap;

  std::shared_ptr<Wav> load(const std::string& path, float preemph) {
    {
      std::lock_guard<std::mutex> lk(cache_mu);
      auto it = cache.find(path);
      if (it != cache.end()) return it->second;
    }
    auto wav = std::make_shared<Wav>();
    std::vector<int16_t> pcm;
    uint16_t ch = 1;
    if (read_wav_pcm16(path, &pcm, &wav->rate, &ch) && ch == 1) {
      normalize_preemph(pcm, preemph, &wav->samples);
      wav->ok = true;
    }
    {
      std::lock_guard<std::mutex> lk(cache_mu);
      if (cache.size() >= cache_cap && !cache_order.empty()) {
        cache.erase(cache_order.front());
        cache_order.erase(cache_order.begin());
      }
      cache[path] = wav;
      cache_order.push_back(path);
    }
    return wav;
  }
};

struct Latch {
  std::mutex mu;
  std::condition_variable cv;
  int remaining;
  explicit Latch(int n) : remaining(n) {}
  void count_down() {
    std::lock_guard<std::mutex> lk(mu);
    if (--remaining == 0) cv.notify_all();
  }
  void wait() {
    std::unique_lock<std::mutex> lk(mu);
    cv.wait(lk, [this] { return remaining == 0; });
  }
};

}  // namespace

extern "C" {

void* segan_io_create(int threads, int cache_cap) {
  return new Engine(threads, cache_cap > 0 ? cache_cap : 512);
}

void segan_io_destroy(void* h) { delete static_cast<Engine*>(h); }

// Gather a batch of slices. paths: num_items C strings; begs/ends: sample ranges;
// out: (num_items, slice_size) float32, zero-padded past the slice end.
// Returns the number of items that failed to decode (0 = success).
int segan_io_gather(void* h, const char** paths, const int64_t* begs,
                    const int64_t* ends, int num_items, int64_t slice_size,
                    float preemph, float* out) {
  auto* eng = static_cast<Engine*>(h);
  std::atomic<int> failures{0};
  Latch latch(num_items);
  for (int i = 0; i < num_items; ++i) {
    const std::string path = paths[i];
    const int64_t beg = begs[i], end = ends[i];
    float* dst = out + static_cast<int64_t>(i) * slice_size;
    eng->pool.submit([eng, path, beg, end, slice_size, preemph, dst, &failures,
                      &latch] {
      std::shared_ptr<Wav> wav;
      try {
        wav = eng->load(path, preemph);
      } catch (...) {
        // decode exceptions (bad_alloc on corrupt sizes, IO errors) count as
        // failures instead of std::terminate-ing the whole process
        wav = std::make_shared<Wav>();
      }
      if (!wav->ok) {
        std::memset(dst, 0, sizeof(float) * slice_size);
        failures.fetch_add(1);
      } else {
        const auto& s = wav->samples;
        const int64_t n = static_cast<int64_t>(s.size());
        const int64_t b = std::max<int64_t>(0, std::min<int64_t>(beg, n));
        const int64_t e = std::max<int64_t>(b, std::min<int64_t>(end, n));
        const int64_t len = std::min<int64_t>(e - b, slice_size);
        if (len > 0) std::memcpy(dst, s.data() + b, sizeof(float) * len);
        if (len < slice_size)
          std::memset(dst + len, 0, sizeof(float) * (slice_size - len));
      }
      latch.count_down();
    });
  }
  latch.wait();
  return failures.load();
}

// Decode one file fully (for inference): returns sample count or -1; caller provides
// capacity; samples written normalized+pre-emphasized.
int64_t segan_io_read(void* h, const char* path, float preemph, float* out,
                      int64_t capacity) {
  auto* eng = static_cast<Engine*>(h);
  std::shared_ptr<Wav> wav;
  try {
    wav = eng->load(path, preemph);
  } catch (...) {
    return -1;
  }
  if (!wav->ok) return -1;
  const int64_t n = static_cast<int64_t>(wav->samples.size());
  if (out && capacity >= n)
    std::memcpy(out, wav->samples.data(), sizeof(float) * n);
  return n;
}

}  // extern "C"
