// tspo_decode_pool — native multi-video decode executor.
//
// The reference's decord wheel parallelizes WITHIN one video (frame-threaded
// ffmpeg); its eval pipeline parallelizes ACROSS videos with one python
// process per GPU (mp_tools worker loop, SURVEY.md C17/C18).  On a TPU host
// there is one process per chip, so cross-video parallelism moves here: a
// C++ job queue + worker pool that decodes whole index-gathers concurrently,
// feeding the phase-1 prefetch without python thread overhead.
//
// C ABI (ctypes-friendly; see tspo_tpu/video/native.py::DecodePool):
//   tspo_pool_create(n_threads)                          -> pool*
//   tspo_pool_submit(pool, path, idx, n, out, out_cap)   -> job id (>=0)
//     copies path+indices; `out` is caller-owned and must stay alive until
//     tspo_pool_wait returns for this job.
//   tspo_pool_wait(pool, job)    -> frames written (tspo_gather's return),
//                                   -3 for an unknown job id
//   tspo_pool_pending(pool)      -> jobs submitted but not yet finished
//   tspo_pool_destroy(pool)        joins workers; pending jobs finish first

#include <chrono>
#include <condition_variable>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <unordered_set>
#include <vector>

extern "C" long long tspo_gather(const char* path, const long long* indices,
                                 long long n, unsigned char* out,
                                 long long out_cap);

namespace {

struct Job {
  long long id;
  std::string path;
  std::vector<long long> indices;
  unsigned char* out;
  long long out_cap;
};

// Synthetic job for scaling benchmarks (scripts/bench_decode_pool.py):
// path "bench://sleep_us=S&iters=K" sleeps S µs (models the share of a
// decode a core gives up — IO/demux waits, or the whole job when cores are
// plentiful), then does K iterations of FIXED arithmetic work (models the
// CPU-bound share; fixed work — not fixed wall time — so timesharing
// threads cannot fake scaling), then writes a deterministic byte pattern so
// callers can verify delivery.  Returns indices.size() like tspo_gather.
// Lets the queue/condvar machinery be measured at any worker count without
// ffmpeg or real cores.
long long run_bench_job(const Job& job) {
  long long sleep_us = 0, iters = 0;
  const char* s = strstr(job.path.c_str(), "sleep_us=");
  if (s) sleep_us = atoll(s + 9);
  const char* c = strstr(job.path.c_str(), "iters=");
  if (c) iters = atoll(c + 6);
  if (sleep_us > 0)
    std::this_thread::sleep_for(std::chrono::microseconds(sleep_us));
  if (iters > 0) {
    volatile unsigned long long sink = 0x9E3779B97F4A7C15ull;
    for (long long i = 0; i < iters; ++i)
      sink = sink * 6364136223846793005ull + 1442695040888963407ull;
  }
  for (long long i = 0; i < job.out_cap; ++i)
    job.out[i] = (unsigned char)((job.id * 131 + i * 17) & 0xFF);
  return (long long)job.indices.size();
}

struct Pool {
  std::mutex mu;
  std::condition_variable cv_submit;   // workers wait for jobs
  std::condition_variable cv_done;     // waiters wait for results
  std::deque<Job> queue;
  std::unordered_map<long long, long long> results;
  std::unordered_set<long long> pending_ids;   // submitted, result not taken
  long long next_id = 0;
  long long inflight = 0;              // queued + running
  bool stop = false;
  std::vector<std::thread> workers;

  explicit Pool(int n_threads) {
    for (int i = 0; i < n_threads; ++i)
      workers.emplace_back([this] { run(); });
  }

  void run() {
    for (;;) {
      Job job;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_submit.wait(lk, [this] { return stop || !queue.empty(); });
        if (queue.empty()) return;      // stop && drained
        job = std::move(queue.front());
        queue.pop_front();
      }
      long long rc =
          strncmp(job.path.c_str(), "bench://", 8) == 0
              ? run_bench_job(job)
              : tspo_gather(job.path.c_str(), job.indices.data(),
                            (long long)job.indices.size(), job.out,
                            job.out_cap);
      {
        std::lock_guard<std::mutex> lk(mu);
        results[job.id] = rc;
        --inflight;
      }
      cv_done.notify_all();
    }
  }

  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv_submit.notify_all();
    for (auto& w : workers) w.join();
  }
};

}  // namespace

extern "C" {

void* tspo_pool_create(int n_threads) {
  if (n_threads < 1) n_threads = 1;
  return new Pool(n_threads);
}

long long tspo_pool_submit(void* pool, const char* path,
                           const long long* indices, long long n,
                           unsigned char* out, long long out_cap) {
  Pool* p = static_cast<Pool*>(pool);
  Job job;
  job.path = path;
  job.indices.assign(indices, indices + (n > 0 ? n : 0));
  job.out = out;
  job.out_cap = out_cap;
  long long id;
  {
    std::lock_guard<std::mutex> lk(p->mu);
    id = job.id = p->next_id++;
    p->pending_ids.insert(id);
    p->queue.push_back(std::move(job));
    ++p->inflight;
  }
  p->cv_submit.notify_one();
  return id;
}

long long tspo_pool_wait(void* pool, long long job_id) {
  Pool* p = static_cast<Pool*>(pool);
  std::unique_lock<std::mutex> lk(p->mu);
  p->cv_done.wait(lk, [&] {
    return p->results.count(job_id) || !p->pending_ids.count(job_id);
  });
  auto it = p->results.find(job_id);
  if (it == p->results.end()) return -3;     // unknown or already consumed
  long long rc = it->second;
  p->results.erase(it);
  p->pending_ids.erase(job_id);
  return rc;
}

int tspo_pool_pending(void* pool) {
  Pool* p = static_cast<Pool*>(pool);
  std::lock_guard<std::mutex> lk(p->mu);
  return (int)p->inflight;
}

void tspo_pool_destroy(void* pool) { delete static_cast<Pool*>(pool); }

}  // extern "C"
