// Native prefetching .npy reader for the data pipeline.
//
// The reference's loader is a torch Dataset + DataLoader with Python worker
// processes (reference: ttt/datasets/preembedding_dataset.py:82-91,
// train.py:127 num_workers=2); the TPU rebuild's default is a Python thread
// prefetcher (data/dataset.py DataModule.batches). This module is the
// optional native fast path: a C++ thread pool that parses .npy headers and
// preads file contents into malloc'd buffers off the GIL, so host-side
// decode never stalls the device feed even with many concurrent shards.
//
// Exposed as a tiny C API consumed via ctypes (no pybind11 in the image).
// Supported payloads: little-endian f2/f4/f8, i1/i2/i4/i8, u1, C-order,
// .npy format versions 1.x/2.x.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Result {
  void* data = nullptr;
  int64_t shape[8] = {0};
  int32_t ndim = 0;
  int32_t dtype = -1;  // 0:f4 1:f2 2:f8 3:i1 4:i2 5:i4 6:i8 7:u1
  int32_t status = -1; // 0 ok, <0 error code
};

int dtype_code(const std::string& descr) {
  // descr like "<f4", "|u1", "<i8"; big-endian unsupported.
  if (descr.size() < 3) return -1;
  char bo = descr[0];
  if (bo != '<' && bo != '|' && bo != '=') return -1;
  const std::string t = descr.substr(1);
  if (t == "f4") return 0;
  if (t == "f2") return 1;
  if (t == "f8") return 2;
  if (t == "i1") return 3;
  if (t == "i2") return 4;
  if (t == "i4") return 5;
  if (t == "i8") return 6;
  if (t == "u1") return 7;
  return -1;
}

size_t dtype_size(int code) {
  static const size_t sizes[] = {4, 2, 8, 1, 2, 4, 8, 1};
  return (code >= 0 && code < 8) ? sizes[code] : 0;
}

// Parse the python-dict header: {'descr': '<f4', 'fortran_order': False,
// 'shape': (3, 4), }
int parse_header(const std::string& hdr, Result* r) {
  auto find_val = [&](const char* key) -> std::string {
    size_t p = hdr.find(key);
    if (p == std::string::npos) return "";
    p = hdr.find(':', p);
    if (p == std::string::npos) return "";
    ++p;
    while (p < hdr.size() && (hdr[p] == ' ')) ++p;
    return hdr.substr(p);
  };

  std::string descr = find_val("'descr'");
  if (descr.empty() || descr[0] != '\'') return -2;
  size_t q = descr.find('\'', 1);
  if (q == std::string::npos) return -2;
  r->dtype = dtype_code(descr.substr(1, q - 1));
  if (r->dtype < 0) return -3;

  std::string forder = find_val("'fortran_order'");
  if (forder.rfind("False", 0) != 0) return -4;  // C-order only

  std::string shape = find_val("'shape'");
  if (shape.empty() || shape[0] != '(') return -5;
  size_t close = shape.find(')');
  if (close == std::string::npos) return -5;
  std::string dims = shape.substr(1, close - 1);
  r->ndim = 0;
  const char* s = dims.c_str();
  char* end = nullptr;
  while (*s) {
    while (*s == ' ' || *s == ',') ++s;
    if (!*s) break;
    long long v = strtoll(s, &end, 10);
    if (end == s) break;
    if (r->ndim >= 8) return -6;
    r->shape[r->ndim++] = (int64_t)v;
    s = end;
  }
  return 0;
}

int load_npy(const char* path, Result* r) {
  FILE* f = fopen(path, "rb");
  if (!f) return -10;
  unsigned char magic[8];
  if (fread(magic, 1, 8, f) != 8 || memcmp(magic, "\x93NUMPY", 6) != 0) {
    fclose(f);
    return -11;
  }
  int major = magic[6];
  uint32_t hlen = 0;
  if (major == 1) {
    unsigned char b[2];
    if (fread(b, 1, 2, f) != 2) { fclose(f); return -12; }
    hlen = b[0] | (b[1] << 8);
  } else {
    unsigned char b[4];
    if (fread(b, 1, 4, f) != 4) { fclose(f); return -12; }
    hlen = b[0] | (b[1] << 8) | (b[2] << 16) | ((uint32_t)b[3] << 24);
  }
  std::string hdr(hlen, '\0');
  if (fread(&hdr[0], 1, hlen, f) != hlen) { fclose(f); return -13; }
  int rc = parse_header(hdr, r);
  if (rc != 0) { fclose(f); return rc; }

  size_t count = 1;
  for (int i = 0; i < r->ndim; ++i) count *= (size_t)r->shape[i];
  size_t nbytes = count * dtype_size(r->dtype);
  r->data = malloc(nbytes ? nbytes : 1);
  if (!r->data) { fclose(f); return -14; }
  if (nbytes && fread(r->data, 1, nbytes, f) != nbytes) {
    free(r->data);
    r->data = nullptr;
    fclose(f);
    return -15;
  }
  fclose(f);
  return 0;
}

struct Pool {
  std::vector<std::thread> workers;
  std::deque<std::pair<int64_t, std::string>> queue;
  std::map<int64_t, Result> done;
  std::map<int64_t, int> pending;  // queued or in-flight job ids (count)
  std::mutex mu;
  std::condition_variable cv_task, cv_done;
  bool stop = false;

  explicit Pool(int n) {
    for (int i = 0; i < n; ++i) workers.emplace_back([this] { run(); });
  }

  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv_task.notify_all();
    for (auto& t : workers) t.join();
    for (auto& kv : done) free(kv.second.data);
  }

  void run() {
    for (;;) {
      std::pair<int64_t, std::string> task;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_task.wait(lk, [this] { return stop || !queue.empty(); });
        if (stop && queue.empty()) return;
        task = queue.front();
        queue.pop_front();
      }
      Result r;
      r.status = load_npy(task.second.c_str(), &r);
      {
        std::lock_guard<std::mutex> lk(mu);
        auto it = done.find(task.first);
        if (it != done.end()) free(it->second.data);  // duplicate id: drop stale payload
        done[task.first] = r;
        auto pit = pending.find(task.first);
        if (pit != pending.end() && --pit->second == 0) pending.erase(pit);
      }
      cv_done.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* nl_pool_create(int num_threads) { return new Pool(num_threads > 0 ? num_threads : 2); }

void nl_pool_destroy(void* pool) { delete static_cast<Pool*>(pool); }

void nl_submit(void* pool, int64_t id, const char* path) {
  Pool* p = static_cast<Pool*>(pool);
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->queue.emplace_back(id, std::string(path));
    p->pending[id]++;
  }
  p->cv_task.notify_one();
}

// Blocks until job `id` completes. On success returns 0 and transfers
// ownership of *data to the caller (release with nl_free). Waiting on an id
// that was never submitted (and has no buffered result) returns -20 instead
// of blocking forever.
int nl_wait(void* pool, int64_t id, void** data, int64_t* shape, int32_t* ndim, int32_t* dtype) {
  Pool* p = static_cast<Pool*>(pool);
  std::unique_lock<std::mutex> lk(p->mu);
  p->cv_done.wait(lk, [&] { return p->done.count(id) > 0 || p->pending.count(id) == 0; });
  if (p->done.count(id) == 0) return -20;  // unknown id
  Result r = p->done[id];
  p->done.erase(id);
  lk.unlock();
  if (r.status != 0) {
    free(r.data);
    return r.status;
  }
  *data = r.data;
  for (int i = 0; i < r.ndim; ++i) shape[i] = r.shape[i];
  *ndim = r.ndim;
  *dtype = r.dtype;
  return 0;
}

void nl_free(void* data) { free(data); }

// Synchronous single-file load (no pool) — used by load_tensor's fast path.
int nl_load(const char* path, void** data, int64_t* shape, int32_t* ndim, int32_t* dtype) {
  Result r;
  int rc = load_npy(path, &r);
  if (rc != 0) return rc;
  *data = r.data;
  for (int i = 0; i < r.ndim; ++i) shape[i] = r.shape[i];
  *ndim = r.ndim;
  *dtype = r.dtype;
  return 0;
}

}  // extern "C"
