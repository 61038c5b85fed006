// percepnet_io: native host-side IO for the TPU PercepNet framework.
//
// Roles (TPU-native equivalents of the reference's host C++/shell layers):
//   * PCM s16le codec with the reference's numeric conventions
//     (/32768 read scale, C truncation-toward-zero write clamp —
//     reference main.cpp:34, denoise.cpp:724).
//   * 138-float feature-record codec (denoise.cpp:761-773 layout) with the
//     x30 band-energy scaling quirk applied loader-side
//     (rnn_train.py:48-49).
//   * A multithreaded, double-buffered batch loader that feeds training
//     batches from record filelists — replacing the reference's
//     DataLoader workers (rnn_train.py:610-623) and the 8-process shell
//     fan-out (utils/run.sh:98-122) with a single prefetching ring that
//     keeps the TPU fed while it steps.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libpercepnet_io.so \
//            percepnet_io.cpp -lpthread
// Python bindings: percepnet_tpu/io/native.py (ctypes).

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Chunk {            // one (file, frame-offset) training sequence
  int32_t file;
  int64_t start_frame;
};

struct Batch {
  std::vector<float> data;  // [batch * seq_len * record_dim]
};

class Loader {
 public:
  Loader(std::vector<std::string> files, int seq_len, int batch,
         int record_dim, int shard_id, int num_shards, uint32_t seed,
         // queue_cap is a HARD bound on loader memory: finished batches
         // in ready_ plus in-flight claims never exceed queue_cap
         // batches (each batch*seq_len*record_dim floats, ~110 MB/batch
         // at the recipe shape).  Caps below n_threads simply idle the
         // excess workers.
         int scale_cols, float scale, int n_threads, int queue_cap)
      : files_(std::move(files)), seq_len_(seq_len), batch_(batch),
        record_dim_(record_dim), seed_(seed), scale_cols_(scale_cols),
        scale_(scale), queue_cap_(queue_cap), stop_(false) {
    // index all fixed-length chunks, host-sharded by file
    for (int32_t fi = shard_id; fi < (int32_t)files_.size();
         fi += num_shards) {
      FILE* f = fopen(files_[fi].c_str(), "rb");
      if (!f) continue;
      fseek(f, 0, SEEK_END);
      int64_t frames = ftell(f) / (4 * record_dim_);
      fclose(f);
      for (int64_t c = 0; c + seq_len_ <= frames; c += seq_len_)
        chunks_.push_back({fi, c});
      my_files_.push_back(fi);
    }
    for (int i = 0; i < n_threads; ++i)
      workers_.emplace_back([this, i] { Work(i); });
  }

  ~Loader() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_pop_.notify_all();
    cv_push_.notify_all();
    for (auto& t : workers_) t.join();
  }

  int64_t NumChunks() const { return (int64_t)chunks_.size(); }
  int64_t FailedReads() const { return failed_reads_.load(); }

  // Blocking: copy the next ready batch into out. Returns 0 on success,
  // -1 on shutdown, -2 if the chunk index is empty (no readable file holds
  // at least seq_len frames) — callers must surface that, not hang.
  int Next(float* out) {
    if (chunks_.empty()) return -2;
    std::unique_lock<std::mutex> lk(mu_);
    // Batches are delivered strictly in stream order (keyed on the claimed
    // base position), so the stream is deterministic for any n_threads —
    // matching batch_iterator's seeded semantics for resume reproducibility.
    cv_pop_.wait(lk, [this] {
      return ready_.count(next_deliver_) != 0 || stop_;
    });
    auto it = ready_.find(next_deliver_);
    if (it == ready_.end()) return -1;
    Batch b = std::move(it->second);
    ready_.erase(it);
    next_deliver_ += batch_;
    lk.unlock();
    cv_push_.notify_all();
    memcpy(out, b.data.data(), b.data.size() * sizeof(float));
    return 0;
  }

 private:
  // Deterministic infinite chunk stream: epoch e uses seed_+e shuffle;
  // workers claim positions from a shared atomic counter.
  Chunk ChunkAt(int64_t pos) {
    int64_t n = (int64_t)chunks_.size();
    int64_t epoch = pos / n, i = pos % n;
    std::lock_guard<std::mutex> lk(order_mu_);
    if (epoch != order_epoch_) {
      order_.resize(n);
      for (int64_t j = 0; j < n; ++j) order_[j] = j;
      std::mt19937 rng(seed_ + (uint32_t)epoch);
      std::shuffle(order_.begin(), order_.end(), rng);
      order_epoch_ = epoch;
    }
    return chunks_[order_[i]];
  }

  bool ReadChunk(const Chunk& c, float* dst) {
    FILE* f = fopen(files_[c.file].c_str(), "rb");
    if (!f) return false;
    int64_t bytes = (int64_t)seq_len_ * record_dim_ * 4;
    if (fseek(f, c.start_frame * record_dim_ * 4, SEEK_SET) != 0 ||
        fread(dst, 1, bytes, f) != (size_t)bytes) {
      fclose(f);
      return false;
    }
    fclose(f);
    for (int64_t t = 0; t < seq_len_; ++t) {
      float* row = dst + t * record_dim_;
      for (int j = 0; j < scale_cols_; ++j) row[j] *= scale_;
    }
    return true;
  }

  void Work(int) {
    if (chunks_.empty()) return;
    while (true) {
      // gate BEFORE claiming a position, counting in-flight claims:
      // ready_.size() + in_flight_ never exceeds queue_cap_, so the cap
      // is a hard memory bound.  A worker blocked here holds no claimed
      // base, and a claimed base always completes ungated, so the
      // in-order delivery in Next() cannot deadlock: whichever worker
      // claimed next_deliver_ runs to emplace without re-entering the
      // gate.
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_push_.wait(lk, [this] {
          return (int)ready_.size() + in_flight_ < queue_cap_ || stop_;
        });
        if (stop_) return;
        ++in_flight_;
      }
      // assemble one batch from `batch_` consecutive stream positions
      int64_t base = next_pos_.fetch_add(batch_);
      Batch b;
      b.data.resize((size_t)batch_ * seq_len_ * record_dim_);
      for (int i = 0; i < batch_; ++i) {
        Chunk c = ChunkAt(base + i);
        if (!ReadChunk(c, b.data.data() +
                               (size_t)i * seq_len_ * record_dim_)) {
          // zero-fill the row but COUNT it — a deleted/truncated file
          // mid-training must not silently corrupt the data stream
          memset(b.data.data() + (size_t)i * seq_len_ * record_dim_, 0,
                 (size_t)seq_len_ * record_dim_ * 4);
          failed_reads_.fetch_add(1);
        }
      }
      std::unique_lock<std::mutex> lk(mu_);
      --in_flight_;
      if (stop_) return;
      ready_.emplace(base, std::move(b));
      lk.unlock();
      cv_pop_.notify_all();
    }
  }

  std::vector<std::string> files_;
  std::vector<int32_t> my_files_;
  std::vector<Chunk> chunks_;
  int seq_len_, batch_, record_dim_;
  uint32_t seed_;
  int scale_cols_;
  float scale_;
  int queue_cap_;
  int in_flight_ = 0;  // claimed-but-not-yet-ready batches (guarded by mu_)

  std::mutex mu_, order_mu_;
  std::condition_variable cv_pop_, cv_push_;
  std::map<int64_t, Batch> ready_;  // base stream position -> batch
  int64_t next_deliver_ = 0;
  std::vector<std::thread> workers_;
  std::atomic<int64_t> next_pos_{0};
  std::atomic<int64_t> failed_reads_{0};
  std::vector<int64_t> order_;
  int64_t order_epoch_ = -1;
  bool stop_;
};

}  // namespace

extern "C" {

void* pn_loader_create(const char** files, int n_files, int seq_len,
                       int batch, int record_dim, int shard_id,
                       int num_shards, uint32_t seed, int scale_cols,
                       float scale, int n_threads, int queue_cap) {
  std::vector<std::string> fs(files, files + n_files);
  return new Loader(std::move(fs), seq_len, batch, record_dim, shard_id,
                    num_shards, seed, scale_cols, scale, n_threads,
                    queue_cap);
}

int64_t pn_loader_num_chunks(void* h) {
  return static_cast<Loader*>(h)->NumChunks();
}

int64_t pn_loader_failed_reads(void* h) {
  return static_cast<Loader*>(h)->FailedReads();
}

int pn_loader_next(void* h, float* out) {
  return static_cast<Loader*>(h)->Next(out);
}

void pn_loader_destroy(void* h) { delete static_cast<Loader*>(h); }

// --- PCM codec ------------------------------------------------------------

// Read s16le PCM into floats. scale=1/32768 for inference (main.cpp:34),
// 1.0 for feature-gen raw amplitudes (denoise.cpp:41). Returns samples read.
int64_t pn_pcm_read(const char* path, float* out, int64_t max_n,
                    float scale) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  std::vector<int16_t> buf(1 << 16);
  int64_t n = 0;
  size_t got;
  while (n < max_n &&
         (got = fread(buf.data(), 2,
                      std::min<int64_t>((int64_t)buf.size(), max_n - n),
                      f)) > 0) {
    for (size_t i = 0; i < got; ++i) out[n + i] = buf[i] * scale;
    n += (int64_t)got;
  }
  fclose(f);
  return n;
}

// Write float PCM as s16le with the reference clamp+truncate semantics:
// (short)fmax(-32768, fmin(32767, x*scale))  (denoise.cpp:722-726).
int pn_pcm_write(const char* path, const float* x, int64_t n, float scale) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  std::vector<int16_t> buf(1 << 16);
  for (int64_t i = 0; i < n;) {
    int64_t m = std::min<int64_t>(n - i, (int64_t)buf.size());
    for (int64_t j = 0; j < m; ++j) {
      double v = (double)x[i + j] * scale;
      v = v > 32767.0 ? 32767.0 : (v < -32768.0 ? -32768.0 : v);
      buf[j] = (int16_t)v;  // C cast truncates toward zero
    }
    if (fwrite(buf.data(), 2, m, f) != (size_t)m) {
      fclose(f);
      return -1;
    }
    i += m;
  }
  fclose(f);
  return 0;
}

}  // extern "C"
