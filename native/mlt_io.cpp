// mlt_io: native host-side data loading for multimodal_lipread_tpu.
//
// The reference delegates all host decode work to third-party native code
// (pydub/ffmpeg + torchaudio C++ for audio, numpy/OpenCV for the .npy lip
// store — SURVEY.md §2.9). This library is the framework's first-party
// equivalent for the two hot host paths that feed the TPU:
//
//   1. batched PCM WAV decode → fixed-length float32 waveforms
//      (pad/truncate to target_samples, mono downmix, int16-range floats,
//      matching audio/utils/audio_processor.py:23-46 semantics)
//   2. batched .npy uint8 lip-region loads → float32 (optionally scaled by
//      1/255), matching video/data_utils/dataset_loader.py:84-94
//
// Both are embarrassingly parallel file reads; a std::thread pool saturates
// storage while Python stays single-threaded. Exposed as a C ABI for ctypes.
//
// Error contract: functions return 0 on success, or (1 + index) of the first
// file that failed. Outputs for failed files are zero-filled.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Result {
    std::atomic<long long> first_error{-1};
    void fail(long long idx) {
        long long expected = -1;
        first_error.compare_exchange_strong(expected, idx);
    }
};

// ---------------------------------------------------------------- WAV decode

bool read_file(const char* path, std::vector<uint8_t>& buf) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return false;
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    if (size <= 0) { std::fclose(f); return false; }
    buf.resize(static_cast<size_t>(size));
    size_t got = std::fread(buf.data(), 1, buf.size(), f);
    std::fclose(f);
    return got == buf.size();
}

inline uint32_t rd_u32(const uint8_t* p) {
    return p[0] | (p[1] << 8) | (p[2] << 16) | (uint32_t(p[3]) << 24);
}
inline uint16_t rd_u16(const uint8_t* p) { return p[0] | (p[1] << 8); }

// Decode a PCM16 RIFF/WAVE file into float32 (int16-range), mono-downmixed,
// padded/truncated to target_samples. Returns false on parse failure or when
// the file's sample rate differs from expected_rate (so callers fall back to
// a resampling decode path instead of silently training on mis-rated audio).
bool decode_wav(const char* path, int target_samples, int expected_rate, float* out) {
    std::vector<uint8_t> buf;
    if (!read_file(path, buf) || buf.size() < 44) return false;
    if (std::memcmp(buf.data(), "RIFF", 4) != 0 || std::memcmp(buf.data() + 8, "WAVE", 4) != 0)
        return false;

    uint16_t channels = 0, bits = 0, format = 0;
    uint32_t sample_rate = 0;
    const uint8_t* data = nullptr;
    uint32_t data_len = 0;

    size_t pos = 12;
    while (pos + 8 <= buf.size()) {
        const uint8_t* chunk = buf.data() + pos;
        uint32_t chunk_len = rd_u32(chunk + 4);
        if (std::memcmp(chunk, "fmt ", 4) == 0 && pos + 8 + 16 <= buf.size()) {
            format = rd_u16(chunk + 8);
            channels = rd_u16(chunk + 10);
            sample_rate = rd_u32(chunk + 12);
            bits = rd_u16(chunk + 22);
        } else if (std::memcmp(chunk, "data", 4) == 0) {
            data = chunk + 8;
            data_len = chunk_len;
            if (pos + 8 + data_len > buf.size()) data_len = uint32_t(buf.size() - pos - 8);
            break;
        }
        pos += 8 + chunk_len + (chunk_len & 1);  // chunks are word-aligned
    }
    if (!data || format != 1 || bits != 16 || channels == 0) return false;
    if (expected_rate > 0 && sample_rate != uint32_t(expected_rate)) return false;

    const int16_t* samples = reinterpret_cast<const int16_t*>(data);
    long long n_frames = static_cast<long long>(data_len) / (2 * channels);
    long long n = n_frames < target_samples ? n_frames : target_samples;

    if (channels == 1) {
        for (long long i = 0; i < n; ++i) out[i] = static_cast<float>(samples[i]);
    } else {
        for (long long i = 0; i < n; ++i) {
            long long acc = 0;
            for (int c = 0; c < channels; ++c) acc += samples[i * channels + c];
            out[i] = static_cast<float>(acc) / channels;
        }
    }
    for (long long i = n; i < target_samples; ++i) out[i] = 0.0f;
    return true;
}

// ---------------------------------------------------------------- NPY loader

// Parse "'shape': (a, b, ...)" from an npy header dict; returns the element
// count or -1 on parse failure.
long long parse_npy_shape_elems(const std::string& header) {
    size_t key = header.find("'shape'");
    if (key == std::string::npos) return -1;
    size_t open = header.find('(', key);
    size_t close = header.find(')', open);
    if (open == std::string::npos || close == std::string::npos) return -1;
    long long elems = 1;
    long long current = -1;
    bool any = false;
    for (size_t i = open + 1; i < close; ++i) {
        char c = header[i];
        if (c >= '0' && c <= '9') {
            current = (current < 0 ? 0 : current) * 10 + (c - '0');
        } else if (c == ',' || c == ' ') {
            if (current >= 0) {
                elems *= current;
                any = true;
                current = -1;
            }
        } else {
            return -1;
        }
    }
    if (current >= 0) {
        elems *= current;
        any = true;
    }
    return any ? elems : 1;  // '()' scalar → 1 element
}

// Minimal .npy v1/v2 validation for C-contiguous uint8 arrays of exactly
// expected_elems elements; on success sets data_off to the payload start.
// Rejecting shape mismatches matters: loading the leading bytes of a
// differently-shaped array would yield silently scrambled data.
bool parse_npy_u8_header(const std::vector<uint8_t>& buf, long long expected_elems,
                         size_t* data_off) {
    if (buf.size() < 12) return false;
    static const uint8_t magic[6] = {0x93, 'N', 'U', 'M', 'P', 'Y'};
    if (std::memcmp(buf.data(), magic, 6) != 0) return false;
    uint8_t major = buf[6];
    size_t header_len, header_off;
    if (major == 1) {
        header_len = rd_u16(buf.data() + 8);
        header_off = 10;
    } else {
        header_len = rd_u32(buf.data() + 8);  // safe: buf.size() >= 12 checked above
        header_off = 12;
    }
    if (header_off + header_len > buf.size()) return false;
    std::string header(reinterpret_cast<const char*>(buf.data() + header_off), header_len);
    if (header.find("'|u1'") == std::string::npos && header.find("'uint8'") == std::string::npos)
        return false;
    if (header.find("'fortran_order': True") != std::string::npos) return false;
    if (parse_npy_shape_elems(header) != expected_elems) return false;
    *data_off = header_off + header_len;
    if (static_cast<long long>(buf.size() - *data_off) < expected_elems) return false;
    return true;
}

bool load_npy_u8(const char* path, long long expected_elems, float scale, float* out) {
    std::vector<uint8_t> buf;
    size_t data_off;
    if (!read_file(path, buf) || !parse_npy_u8_header(buf, expected_elems, &data_off))
        return false;
    const uint8_t* p = buf.data() + data_off;
    for (long long i = 0; i < expected_elems; ++i) out[i] = p[i] * scale;
    return true;
}

// Raw-bytes variant of load_npy_u8: same validation, uint8 output (callers
// keep the 4x-smaller host→device copy and normalize on device).
bool load_npy_u8_raw(const char* path, long long expected_elems, uint8_t* out) {
    std::vector<uint8_t> buf;
    size_t data_off;
    if (!read_file(path, buf) || !parse_npy_u8_header(buf, expected_elems, &data_off))
        return false;
    std::memcpy(out, buf.data() + data_off, expected_elems);
    return true;
}

// ---------------------------------------------------------------- prefetcher

// Bounded in-order prefetcher: a worker pool reads records in a
// caller-supplied epoch order into a sliding window of `capacity` slots;
// the consumer drains them in order. This is the native replacement for a
// host DataLoader's worker processes: Python supplies the shuffled order
// once per epoch and then pulls fixed-size batches while disk reads overlap
// both compute and the host→device copies.
struct Prefetcher {
    std::vector<std::string> paths;
    int kind;                 // 0 = raw uint8 .npy records, 1 = WAV → f32
    long long record_elems;   // uint8 bytes (kind 0) / f32 samples (kind 1)
    int expected_rate;
    long long capacity;
    std::vector<std::vector<uint8_t>> slots;
    std::vector<int> state;   // 0 empty, 1 ready, 2 failed(zero-filled)
    std::vector<long long> order;
    long long n_epoch = 0;
    long long next_fill = 0;
    long long next_consume = 0;
    long long first_error = -1;
    long long generation = 0;  // bumped by start(): stale reads are discarded
    bool stop = false;
    std::mutex m;
    std::condition_variable cv_ready, cv_space;
    std::vector<std::thread> workers;

    size_t record_bytes() const {
        return static_cast<size_t>(record_elems) * (kind == 1 ? 4 : 1);
    }

    void worker_loop() {
        // decode into a thread-local scratch, publish into the shared slot
        // under the lock ONLY if the epoch generation is unchanged — a
        // restart (mlt_prefetch_start on an undrained epoch) invalidates
        // in-flight reads instead of letting them corrupt the new epoch's
        // slots or dereference the reassigned order vector
        std::vector<uint8_t> scratch(record_bytes());
        while (true) {
            long long pos, file_idx, gen;
            {
                std::unique_lock<std::mutex> lk(m);
                cv_space.wait(lk, [&] {
                    return stop || (next_fill < n_epoch && next_fill < next_consume + capacity);
                });
                if (stop) return;
                pos = next_fill++;
                file_idx = order[pos];
                gen = generation;
            }
            const std::string& p = paths[static_cast<size_t>(file_idx)];
            bool ok = (kind == 0)
                ? load_npy_u8_raw(p.c_str(), record_elems, scratch.data())
                : decode_wav(p.c_str(), static_cast<int>(record_elems), expected_rate,
                             reinterpret_cast<float*>(scratch.data()));
            {
                std::lock_guard<std::mutex> lk(m);
                if (gen != generation) continue;  // epoch was restarted
                long long slot = pos % capacity;
                if (ok) {
                    std::memcpy(slots[slot].data(), scratch.data(), record_bytes());
                } else {
                    std::memset(slots[slot].data(), 0, record_bytes());
                    if (first_error < 0) first_error = file_idx;
                }
                state[slot] = ok ? 1 : 2;
            }
            cv_ready.notify_all();
        }
    }
};

// ---------------------------------------------------------------- thread pool

template <typename Fn>
void parallel_for(long long n, int n_threads, Fn fn) {
    if (n_threads <= 1 || n <= 1) {
        for (long long i = 0; i < n; ++i) fn(i);
        return;
    }
    std::atomic<long long> next{0};
    auto worker = [&]() {
        while (true) {
            long long i = next.fetch_add(1);
            if (i >= n) break;
            fn(i);
        }
    };
    int k = n_threads < n ? n_threads : static_cast<int>(n);
    std::vector<std::thread> threads;
    threads.reserve(k);
    for (int t = 0; t < k; ++t) threads.emplace_back(worker);
    for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Decode n WAV files into out[n * target_samples] float32, in parallel.
// expected_rate > 0 enforces a sample rate (mismatches count as failures).
long long mlt_load_wav_batch(const char** paths, long long n, int target_samples,
                             int expected_rate, float* out, int n_threads) {
    Result res;
    parallel_for(n, n_threads, [&](long long i) {
        float* dst = out + i * target_samples;
        if (!decode_wav(paths[i], target_samples, expected_rate, dst)) {
            std::memset(dst, 0, sizeof(float) * target_samples);
            res.fail(i);
        }
    });
    return res.first_error.load() + 1;  // 0 = success
}

// Load n uint8 .npy files of expected_elems each into out, scaled, in parallel.
long long mlt_load_npy_u8_batch(const char** paths, long long n, long long expected_elems,
                                float scale, float* out, int n_threads) {
    Result res;
    parallel_for(n, n_threads, [&](long long i) {
        float* dst = out + i * expected_elems;
        if (!load_npy_u8(paths[i], expected_elems, scale, dst)) {
            std::memset(dst, 0, sizeof(float) * expected_elems);
            res.fail(i);
        }
    });
    return res.first_error.load() + 1;
}

// Create a prefetcher over n files. kind: 0 = raw uint8 .npy records of
// record_elems bytes; 1 = PCM WAV decoded to record_elems float32 samples
// (expected_rate enforced when > 0). Returns an opaque handle.
void* mlt_prefetch_create(const char** paths, long long n, int kind,
                          long long record_elems, int expected_rate,
                          long long capacity, int n_threads) {
    if (n <= 0 || record_elems <= 0 || capacity <= 0 || n_threads <= 0) return nullptr;
    auto* pf = new Prefetcher();
    pf->paths.reserve(static_cast<size_t>(n));
    for (long long i = 0; i < n; ++i) pf->paths.emplace_back(paths[i]);
    pf->kind = kind;
    pf->record_elems = record_elems;
    pf->expected_rate = expected_rate;
    pf->capacity = capacity;
    pf->slots.assign(static_cast<size_t>(capacity),
                     std::vector<uint8_t>(pf->record_bytes()));
    pf->state.assign(static_cast<size_t>(capacity), 0);
    int k = n_threads;
    pf->workers.reserve(static_cast<size_t>(k));
    for (int t = 0; t < k; ++t) pf->workers.emplace_back([pf] { pf->worker_loop(); });
    return pf;
}

// Begin an epoch: read files in paths[order[0]], paths[order[1]], ... .
// Resets any in-flight epoch (must not be called concurrently with
// mlt_prefetch_next).
void mlt_prefetch_start(void* handle, const long long* order, long long n_epoch) {
    auto* pf = static_cast<Prefetcher*>(handle);
    {
        std::lock_guard<std::mutex> lk(pf->m);
        pf->generation++;  // invalidate reads still in flight from the old epoch
        pf->order.assign(order, order + n_epoch);
        pf->n_epoch = n_epoch;
        pf->next_fill = 0;
        pf->next_consume = 0;
        pf->first_error = -1;
        std::fill(pf->state.begin(), pf->state.end(), 0);
    }
    pf->cv_space.notify_all();
}

// Copy up to k in-order records into out (contiguous, record_bytes each).
// Blocks until they are ready; returns the number delivered (< k only at
// epoch end, 0 when the epoch is drained).
long long mlt_prefetch_next(void* handle, void* out, long long k) {
    auto* pf = static_cast<Prefetcher*>(handle);
    uint8_t* dst = static_cast<uint8_t*>(out);
    long long delivered = 0;
    for (; delivered < k; ++delivered) {
        std::unique_lock<std::mutex> lk(pf->m);
        if (pf->next_consume >= pf->n_epoch) break;
        long long slot = pf->next_consume % pf->capacity;
        // stop-aware: destroy() must be able to wake a blocked consumer
        // (otherwise it would join workers and delete the Prefetcher while
        // this thread still waits on its condvar — use-after-free)
        pf->cv_ready.wait(lk, [&] { return pf->state[slot] != 0 || pf->stop; });
        if (pf->stop) break;
        std::memcpy(dst + delivered * pf->record_bytes(), pf->slots[slot].data(),
                    pf->record_bytes());
        pf->state[slot] = 0;
        pf->next_consume++;
        lk.unlock();
        pf->cv_space.notify_all();
    }
    return delivered;
}

// Index (into paths) of the first failed read this epoch, or -1.
long long mlt_prefetch_first_error(void* handle) {
    auto* pf = static_cast<Prefetcher*>(handle);
    std::lock_guard<std::mutex> lk(pf->m);
    return pf->first_error;
}

void mlt_prefetch_destroy(void* handle) {
    auto* pf = static_cast<Prefetcher*>(handle);
    {
        std::lock_guard<std::mutex> lk(pf->m);
        pf->stop = true;
    }
    pf->cv_space.notify_all();
    pf->cv_ready.notify_all();  // wake any consumer blocked in _next
    for (auto& t : pf->workers) t.join();
    delete pf;
}

int mlt_io_version() { return 3; }

}  // extern "C"
