// Native prefetching .npy/.npz reader for the data pipeline.
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
// .npy format versions 1.x/2.x — either bare or as the FIRST .npy member of
// a .npz zip container (stored or deflate; matches np.load(...)[first key]).
// Deflated members stream through zlib straight into the result buffer, so
// peak memory is payload + one 64 KB window, never 2x the array.

#include <zlib.h>

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

// Byte source for the .npy parser: a plain file region or a deflate stream.
struct Reader {
  virtual ~Reader() = default;
  virtual bool read(void* dst, size_t n) = 0;  // exactly n bytes or fail
};

struct FileReader : Reader {
  FILE* f;
  size_t remaining;
  FileReader(FILE* file, size_t limit) : f(file), remaining(limit) {}
  bool read(void* dst, size_t n) override {
    if (n > remaining) return false;
    if (fread(dst, 1, n, f) != n) return false;
    remaining -= n;
    return true;
  }
};

struct InflateReader : Reader {
  FILE* f;
  size_t comp_remaining;
  z_stream zs;
  unsigned char inbuf[1 << 16];
  bool ok;
  InflateReader(FILE* file, size_t comp) : f(file), comp_remaining(comp) {
    memset(&zs, 0, sizeof(zs));
    ok = inflateInit2(&zs, -15) == Z_OK;  // raw deflate (zip members)
  }
  ~InflateReader() override {
    if (ok) inflateEnd(&zs);
  }
  bool read(void* dst, size_t n) override {
    if (!ok) return false;
    zs.next_out = (Bytef*)dst;
    zs.avail_out = (uInt)n;
    while (zs.avail_out > 0) {
      if (zs.avail_in == 0) {
        size_t want = comp_remaining < sizeof(inbuf) ? comp_remaining : sizeof(inbuf);
        if (want == 0) return false;  // truncated stream
        size_t got = fread(inbuf, 1, want, f);
        if (got == 0) return false;
        comp_remaining -= got;
        zs.next_in = inbuf;
        zs.avail_in = (uInt)got;
      }
      int rc = inflate(&zs, Z_NO_FLUSH);
      if (rc == Z_STREAM_END) return zs.avail_out == 0;
      if (rc != Z_OK) return false;
    }
    return true;
  }
};

// Parse one .npy stream (header + payload) from `in` into `r`. The payload
// lands directly in the final malloc'd buffer — no staging copy.
int load_npy_stream(Reader& in, Result* r) {
  unsigned char magic[8];
  if (!in.read(magic, 8) || memcmp(magic, "\x93NUMPY", 6) != 0) return -11;
  int major = magic[6];
  uint32_t hlen = 0;
  if (major == 1) {
    unsigned char b[2];
    if (!in.read(b, 2)) return -12;
    hlen = b[0] | (b[1] << 8);
  } else {
    unsigned char b[4];
    if (!in.read(b, 4)) return -12;
    hlen = b[0] | (b[1] << 8) | (b[2] << 16) | ((uint32_t)b[3] << 24);
  }
  std::string hdr(hlen, '\0');
  if (hlen && !in.read(&hdr[0], hlen)) return -13;
  int rc = parse_header(hdr, r);
  if (rc != 0) return rc;

  size_t count = 1;
  for (int i = 0; i < r->ndim; ++i) count *= (size_t)r->shape[i];
  size_t nbytes = count * dtype_size(r->dtype);
  r->data = malloc(nbytes ? nbytes : 1);
  if (!r->data) return -14;
  if (nbytes && !in.read(r->data, nbytes)) {
    free(r->data);
    r->data = nullptr;
    return -15;
  }
  return 0;
}

inline uint16_t rd16(const unsigned char* p) { return p[0] | (p[1] << 8); }
inline uint32_t rd32(const unsigned char* p) {
  return p[0] | (p[1] << 8) | (p[2] << 16) | ((uint32_t)p[3] << 24);
}

// Locate the first `.npy` member of a zip archive (np.savez writes members
// in key order; np.load(...)[list(keys)[0]] reads the same first member).
// Outputs the member's payload offset/compressed size/method. Zip64 archives
// (any 0xFFFFFFFF marker) return -31 and the caller falls back to Python.
int find_zip_member(FILE* f, long* data_off, size_t* comp_size, int* method) {
  if (fseek(f, 0, SEEK_END) != 0) return -30;
  long fsize = ftell(f);
  if (fsize < 22) return -30;
  long tail = fsize < 65557 ? fsize : 65557;  // EOCD + max comment
  std::vector<unsigned char> buf(tail);
  if (fseek(f, fsize - tail, SEEK_SET) != 0) return -30;
  if (fread(buf.data(), 1, (size_t)tail, f) != (size_t)tail) return -30;
  long eocd = -1;
  for (long i = tail - 22; i >= 0; --i) {
    if (buf[i] == 0x50 && buf[i + 1] == 0x4b && buf[i + 2] == 0x05 && buf[i + 3] == 0x06) {
      eocd = i;
      break;
    }
  }
  if (eocd < 0) return -30;
  uint16_t nent = rd16(&buf[eocd + 10]);
  uint32_t cd_size = rd32(&buf[eocd + 12]);
  uint32_t cd_off = rd32(&buf[eocd + 16]);
  if (cd_off == 0xFFFFFFFF || cd_size == 0xFFFFFFFF) return -31;  // zip64

  std::vector<unsigned char> cd(cd_size);
  if (fseek(f, (long)cd_off, SEEK_SET) != 0) return -30;
  if (fread(cd.data(), 1, cd_size, f) != cd_size) return -30;

  size_t p = 0;
  long local_off = -1;
  for (int e = 0; e < nent; ++e) {
    if (p + 46 > cd.size() || rd32(&cd[p]) != 0x02014b50) return -32;
    uint16_t m = rd16(&cd[p + 10]);
    uint32_t csize = rd32(&cd[p + 20]);
    uint16_t name_len = rd16(&cd[p + 28]);
    uint16_t extra_len = rd16(&cd[p + 30]);
    uint16_t comment_len = rd16(&cd[p + 32]);
    uint32_t lho = rd32(&cd[p + 42]);
    if (p + 46 + name_len > cd.size()) return -32;
    std::string name((const char*)&cd[p + 46], name_len);
    if (name.size() >= 4 && name.compare(name.size() - 4, 4, ".npy") == 0) {
      if (csize == 0xFFFFFFFF || lho == 0xFFFFFFFF) return -31;  // zip64
      if (m != 0 && m != 8) return -33;  // stored / deflate only
      *comp_size = csize;
      *method = m;
      local_off = (long)lho;
      break;
    }
    p += 46 + name_len + extra_len + comment_len;
  }
  if (local_off < 0) return -34;  // no .npy member

  unsigned char lh[30];
  if (fseek(f, local_off, SEEK_SET) != 0) return -30;
  if (fread(lh, 1, 30, f) != 30 || rd32(lh) != 0x04034b50) return -35;
  uint16_t nlen = rd16(&lh[26]), elen = rd16(&lh[28]);
  *data_off = local_off + 30 + nlen + elen;
  return 0;
}

int load_any(const char* path, Result* r) {
  FILE* f = fopen(path, "rb");
  if (!f) return -10;
  unsigned char m4[4];
  size_t got = fread(m4, 1, 4, f);
  int rc;
  if (got == 4 && memcmp(m4, "PK\x03\x04", 4) == 0) {
    long data_off = 0;
    size_t comp_size = 0;
    int method = 0;
    rc = find_zip_member(f, &data_off, &comp_size, &method);
    if (rc == 0) {
      if (fseek(f, data_off, SEEK_SET) != 0) {
        rc = -30;
      } else if (method == 0) {
        FileReader in(f, comp_size);
        rc = load_npy_stream(in, r);
      } else {
        InflateReader in(f, comp_size);
        rc = load_npy_stream(in, r);
      }
    }
  } else {
    if (fseek(f, 0, SEEK_SET) != 0) {
      rc = -10;
    } else {
      FileReader in(f, (size_t)-1);
      rc = load_npy_stream(in, r);
    }
  }
  fclose(f);
  return rc;
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
      r.status = load_any(task.second.c_str(), &r);
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
  int rc = load_any(path, &r);
  if (rc != 0) return rc;
  *data = r.data;
  for (int i = 0; i < r.ndim; ++i) shape[i] = r.shape[i];
  *ndim = r.ndim;
  *dtype = r.dtype;
  return 0;
}

}  // extern "C"
