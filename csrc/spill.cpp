// Host-offload spill engine for history caches that exceed device HBM.
//
// TPU-native counterpart of the reference's async copy machinery
// (csrc/async.cpp, csrc/cuda/async_cuda.cu, csrc/thread.h): a single
// background worker thread serializing gather/scatter jobs between a large
// host-resident embedding matrix and fixed staging buffers, with a bounded
// pool of slots whose futures are consumed in FIFO submission order
// (thread.h:26-69 semantics).  The device leg of each transfer is JAX's
// host<->HBM `device_put` / host fetch, driven from Python
// (incagg_gnn_tpu/history_spill.py); this module provides the host-side
// asynchronous gather/scatter into pinned-style staging buffers:
//
//   - gather_async(slot): out[i,:] = table[idx[i],:]   (pull staging,
//     async_cuda.cu:95-110's index_select leg)
//   - scatter_async(slot): table[idx[i],:] = in[i,:]   (push leg,
//     chunked-contiguous or indexed, async_cuda.cu:146-162 / history.py:60-65)
//   - wait(slot): block until that slot's job completes (FIFO pop,
//     thread.h:64-69)
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC spill.cpp -o libincagg_spill.so

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <functional>
#include <mutex>
#include <thread>
#include <vector>

namespace {

struct Job {
  std::function<void()> fn;
  int64_t slot;
};

class Worker {
 public:
  Worker() : stop_(false) {
    thread_ = std::thread([this] { run(); });
  }
  ~Worker() {
    {
      std::lock_guard<std::mutex> g(m_);
      stop_ = true;
    }
    cv_.notify_all();
    thread_.join();
  }

  void submit(int64_t slot, std::function<void()> fn) {
    {
      std::lock_guard<std::mutex> g(m_);
      pending_[slot] += 1;
      q_.push_back(Job{std::move(fn), slot});
    }
    cv_.notify_all();
  }

  void wait(int64_t slot) {
    std::unique_lock<std::mutex> g(m_);
    done_cv_.wait(g, [&] { return pending_[slot] == 0; });
  }

 private:
  void run() {
    for (;;) {
      Job job;
      {
        std::unique_lock<std::mutex> g(m_);
        cv_.wait(g, [&] { return stop_ || !q_.empty(); });
        if (stop_ && q_.empty()) return;
        job = std::move(q_.front());
        q_.pop_front();
      }
      job.fn();
      {
        std::lock_guard<std::mutex> g(m_);
        pending_[job.slot] -= 1;
      }
      done_cv_.notify_all();
    }
  }

  std::thread thread_;
  std::mutex m_;
  std::condition_variable cv_, done_cv_;
  std::deque<Job> q_;
  std::vector<int64_t> pending_ = std::vector<int64_t>(1024, 0);
  bool stop_;
};

Worker* worker() {
  static Worker w;  // one background copy thread, as the reference
  return &w;
}

}  // namespace

extern "C" {

// out[i, :] = table[idx[i], :] for i < num_idx; rows gathered on the worker
// thread (OpenMP within the copy for wide rows).
void spill_gather_async(const float* table, int64_t dim, const int64_t* idx,
                        int64_t num_idx, float* out, int64_t slot) {
  worker()->submit(slot, [=] {
#pragma omp parallel for if (num_idx > 4096)
    for (int64_t i = 0; i < num_idx; ++i) {
      std::memcpy(out + i * dim, table + idx[i] * dim, dim * sizeof(float));
    }
  });
}

// table[offset[k] : offset[k]+count[k], :] = src rows (chunk-contiguous push,
// the offset/count contract of history.py:60-65).
void spill_scatter_chunks_async(float* table, int64_t dim,
                                const int64_t* offset, const int64_t* count,
                                int64_t num_chunks, const float* src,
                                int64_t slot) {
  worker()->submit(slot, [=] {
    int64_t s = 0;
    for (int64_t k = 0; k < num_chunks; ++k) {
      std::memcpy(table + offset[k] * dim, src + s * dim,
                  count[k] * dim * sizeof(float));
      s += count[k];
    }
  });
}

// table[idx[i], :] = src[i, :] (indexed scatter push).
void spill_scatter_async(float* table, int64_t dim, const int64_t* idx,
                         int64_t num_idx, const float* src, int64_t slot) {
  worker()->submit(slot, [=] {
#pragma omp parallel for if (num_idx > 4096)
    for (int64_t i = 0; i < num_idx; ++i) {
      std::memcpy(table + idx[i] * dim, src + i * dim, dim * sizeof(float));
    }
  });
}

void spill_wait(int64_t slot) { worker()->wait(slot); }

}  // extern "C"
