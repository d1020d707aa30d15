// Threaded decode pool: N workers pull file-decode jobs from a queue and
// fill caller-owned float buffers. This is the native data-loader runtime
// the reference implies (synchronous decode inside its frame loop,
// src/inputs/CoFusionReader.cpp:36-60) rebuilt as an asynchronous pool so
// host decode overlaps TPU compute. C ABI for ctypes.

#include <condition_variable>
#include <cstring>
#include <deque>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

extern "C" int exr_decode_file(const char* path, const char* want, float* out,
                               int* out_w, int* out_h);

namespace {

struct Job {
  int ticket;
  std::string path;
  std::string channel;
  float* out;
  int w, h;
};

struct Pool {
  std::vector<std::thread> workers;
  std::deque<Job> jobs;
  std::map<int, int> done;  // ticket -> rc
  std::mutex mu;
  std::condition_variable cv_job, cv_done;
  bool stop = false;

  void work() {
    for (;;) {
      Job j;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_job.wait(lk, [&] { return stop || !jobs.empty(); });
        if (stop && jobs.empty()) return;
        j = jobs.front();
        jobs.pop_front();
      }
      int w = 0, h = 0;
      int rc = exr_decode_file(j.path.c_str(),
                               j.channel.empty() ? nullptr : j.channel.c_str(),
                               j.out, &w, &h);
      if (rc == 0 && (w != j.w || h != j.h)) rc = -200;  // size mismatch
      {
        std::lock_guard<std::mutex> lk(mu);
        done[j.ticket] = rc;
      }
      cv_done.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* pool_create(int n_workers) {
  Pool* p = new Pool();
  if (n_workers < 1) n_workers = 1;
  for (int i = 0; i < n_workers; ++i)
    p->workers.emplace_back([p] { p->work(); });
  return p;
}

void pool_destroy(void* vp) {
  Pool* p = (Pool*)vp;
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->stop = true;
  }
  p->cv_job.notify_all();
  for (auto& t : p->workers) t.join();
  delete p;
}

void pool_submit(void* vp, int ticket, const char* path, const char* channel,
                 float* out, int w, int h) {
  Pool* p = (Pool*)vp;
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->jobs.push_back(
        Job{ticket, path, channel ? channel : "", out, w, h});
  }
  p->cv_job.notify_one();
}

int pool_wait(void* vp, int ticket) {
  Pool* p = (Pool*)vp;
  std::unique_lock<std::mutex> lk(p->mu);
  p->cv_done.wait(lk, [&] { return p->done.count(ticket) > 0; });
  int rc = p->done[ticket];
  p->done.erase(ticket);
  return rc;
}

}  // extern "C"
