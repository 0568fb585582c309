// f2nerf_tpu native data loader.
//
// TPU-native equivalent of the reference's C++ data layer
// (src/dataset.cpp:150-171 Dataset::sample_random_rays): the per-step
// host work — drawing a uniform random (image, i, j) ray batch and
// gathering ground-truth colors — runs here in worker threads that keep
// a ring of ready batches ahead of the training loop, so host batch
// generation fully overlaps device compute. Exposed via a C ABI for
// ctypes (no pybind11 in this environment).
//
// Determinism: each batch slot is generated from a counter-derived
// splitmix64/xoshiro256++ stream seeded by (seed, batch_index), so the
// sequence of batches is independent of thread scheduling.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

struct Rng {
  // xoshiro256++, seeded via splitmix64
  uint64_t s[4];
  explicit Rng(uint64_t seed) {
    uint64_t x = seed;
    for (auto &v : s) {
      x += 0x9e3779b97f4a7c15ULL;
      uint64_t z = x;
      z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
      z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
      v = z ^ (z >> 31);
    }
  }
  static inline uint64_t rotl(uint64_t v, int k) {
    return (v << k) | (v >> (64 - k));
  }
  inline uint64_t next() {
    uint64_t result = rotl(s[0] + s[3], 23) + s[0];
    uint64_t t = s[1] << 17;
    s[2] ^= s[0];
    s[3] ^= s[1];
    s[1] ^= s[2];
    s[0] ^= s[3];
    s[2] ^= t;
    s[3] = rotl(s[3], 45);
    return result;
  }
  // unbiased bounded draw (Lemire)
  inline uint32_t bounded(uint32_t n) {
    uint64_t m = (uint64_t)(uint32_t)next() * n;
    uint32_t l = (uint32_t)m;
    if (l < n) {
      uint32_t t = (uint32_t)(-(int32_t)n) % n;
      while (l < t) {
        m = (uint64_t)(uint32_t)next() * n;
        l = (uint32_t)m;
      }
    }
    return (uint32_t)(m >> 32);
  }
};

struct Batch {
  std::vector<int32_t> cam;   // [B]
  std::vector<int32_t> ij;    // [B, 2]
  std::vector<float> gt;      // [B, 3]
};

struct Loader {
  const float *images;  // [N, H, W, 3], borrowed from numpy
  int32_t n_images, height, width, batch;
  uint64_t seed;
  int queue_depth;

  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::queue<std::pair<uint64_t, Batch>> ready;
  uint64_t next_gen = 0;     // next batch index to generate
  uint64_t next_serve = 0;   // next batch index to hand out
  bool stop = false;

  void fill(uint64_t index, Batch &b) const {
    Rng rng(seed * 0x9e3779b97f4a7c15ULL + index);
    b.cam.resize(batch);
    b.ij.resize(2 * (size_t)batch);
    b.gt.resize(3 * (size_t)batch);
    const size_t img_stride = (size_t)height * width * 3;
    for (int32_t k = 0; k < batch; k++) {
      int32_t c = (int32_t)rng.bounded((uint32_t)n_images);
      int32_t i = (int32_t)rng.bounded((uint32_t)height);
      int32_t j = (int32_t)rng.bounded((uint32_t)width);
      b.cam[k] = c;
      b.ij[2 * (size_t)k] = i;
      b.ij[2 * (size_t)k + 1] = j;
      const float *px =
          images + img_stride * c + ((size_t)i * width + j) * 3;
      std::memcpy(&b.gt[3 * (size_t)k], px, 3 * sizeof(float));
    }
  }

  void worker() {
    while (true) {
      uint64_t index;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_space.wait(lk, [&] {
          return stop || (next_gen < next_serve + (uint64_t)queue_depth);
        });
        if (stop) return;
        index = next_gen++;
      }
      Batch b;
      fill(index, b);
      {
        std::unique_lock<std::mutex> lk(mu);
        ready.emplace(index, std::move(b));
      }
      cv_ready.notify_all();
    }
  }

  // Pop the batch with the next sequential index (batches may complete
  // out of order across workers; serving stays ordered/deterministic).
  bool next(int32_t *cam_out, int32_t *ij_out, float *gt_out) {
    std::vector<std::pair<uint64_t, Batch>> stash;
    Batch out;
    {
      std::unique_lock<std::mutex> lk(mu);
      while (true) {
        bool found = false;
        while (!ready.empty()) {
          auto item = std::move(ready.front());
          ready.pop();
          if (item.first == next_serve) {
            out = std::move(item.second);
            found = true;
            break;
          }
          stash.emplace_back(std::move(item));
        }
        for (auto &s : stash) ready.emplace(std::move(s));
        stash.clear();
        if (found) break;
        if (stop) return false;
        cv_ready.wait(lk);
      }
      next_serve++;
    }
    cv_space.notify_all();
    std::memcpy(cam_out, out.cam.data(), out.cam.size() * 4);
    std::memcpy(ij_out, out.ij.data(), out.ij.size() * 4);
    std::memcpy(gt_out, out.gt.data(), out.gt.size() * 4);
    return true;
  }
};

}  // namespace

extern "C" {

void *f2l_create(const float *images, int32_t n_images, int32_t height,
                 int32_t width, int32_t batch, uint64_t seed,
                 int32_t n_threads, int32_t queue_depth) {
  auto *ld = new Loader();
  ld->images = images;
  ld->n_images = n_images;
  ld->height = height;
  ld->width = width;
  ld->batch = batch;
  ld->seed = seed;
  ld->queue_depth = queue_depth > 0 ? queue_depth : 4;
  int nt = n_threads > 0 ? n_threads : 2;
  for (int t = 0; t < nt; t++)
    ld->workers.emplace_back([ld] { ld->worker(); });
  return ld;
}

int32_t f2l_next(void *handle, int32_t *cam_out, int32_t *ij_out,
                 float *gt_out) {
  return static_cast<Loader *>(handle)->next(cam_out, ij_out, gt_out)
             ? 1
             : 0;
}

void f2l_destroy(void *handle) {
  auto *ld = static_cast<Loader *>(handle);
  {
    std::unique_lock<std::mutex> lk(ld->mu);
    ld->stop = true;
  }
  ld->cv_space.notify_all();
  ld->cv_ready.notify_all();
  for (auto &t : ld->workers) t.join();
  delete ld;
}

}  // extern "C"
