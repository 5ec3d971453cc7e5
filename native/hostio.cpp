// Native host IO engine: streamed IQ ingest with format conversion and
// double-buffered prefetch.
//
// TPU-native equivalent of the reference's ingest runtime: the spewer
// thread (main.c:223-284), int8->complex conversion kernels
// (simd_generic.c:147-153 / simd_avx2.c:264-294) and the bounded
// blocking queue (blocking_queue.h). One reader thread converts blocks
// ahead of the consumer so device compute overlaps file IO; at 100x
// realtime the 8 GB/s conversion stream would bottleneck a Python reader.
//
// C API (ctypes-friendly):
//   hostio_open(path, fmt, block_samples, n_buffers) -> handle | NULL
//   hostio_next(handle, &buf) -> n_valid samples (0 on EOF, -1 error);
//       buf points at interleaved float32 IQ (complex64-compatible)
//   hostio_release(handle)  -- recycle the buffer returned by next
//   hostio_close(handle)
//
// fmt: 0=ci8 (int8 IQ /128), 1=ci16 (>>8 then /128, the reference's
// lossy path, main.c:239-249), 2=cf32 passthrough.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

namespace {

struct Buffer {
    std::vector<float> data;   // 2 * block_samples floats
    long n_valid = 0;
    bool ready = false;        // filled, waiting for consumer
};

struct HostIO {
    FILE* f = nullptr;
    int fmt = 0;
    long block_samples = 0;
    int n_buffers = 0;

    std::vector<Buffer> bufs;
    std::mutex mu;
    std::condition_variable cv_reader;   // signals free buffer available
    std::condition_variable cv_consumer; // signals filled buffer available
    int fill_idx = 0;      // next buffer the reader fills
    int take_idx = 0;      // next buffer the consumer takes
    int taken_idx = -1;    // buffer currently held by the consumer
    bool eof = false;
    bool error = false;
    bool closing = false;
    std::thread reader;

    std::vector<int8_t> raw8;
    std::vector<int16_t> raw16;
};

void convert_ci8(const int8_t* in, float* out, long n_samples) {
    const float k = 1.0f / 128.0f;
    // interleaved IQ pairs; trivially autovectorized
    for (long i = 0; i < 2 * n_samples; i++)
        out[i] = in[i] * k;
}

void convert_ci16(const int16_t* in, float* out, long n_samples) {
    const float k = 1.0f / 128.0f;
    for (long i = 0; i < 2 * n_samples; i++)
        out[i] = (float)(int8_t)(in[i] >> 8) * k;
}

long read_block(HostIO* h, Buffer& b) {
    long want = h->block_samples;
    long got = 0;
    float* out = b.data.data();
    switch (h->fmt) {
    case 0:
        got = (long)fread(h->raw8.data(), 2 * sizeof(int8_t), want, h->f);
        convert_ci8(h->raw8.data(), out, got);
        break;
    case 1:
        got = (long)fread(h->raw16.data(), 2 * sizeof(int16_t), want, h->f);
        convert_ci16(h->raw16.data(), out, got);
        break;
    case 2:
        got = (long)fread(out, 2 * sizeof(float), want, h->f);
        break;
    default:
        return -1;
    }
    if (got < want)
        memset(out + 2 * got, 0, sizeof(float) * 2 * (want - got));
    return got;
}

void reader_main(HostIO* h) {
    for (;;) {
        std::unique_lock<std::mutex> lk(h->mu);
        h->cv_reader.wait(lk, [&] {
            return h->closing || (!h->bufs[h->fill_idx].ready
                                  && h->fill_idx != h->taken_idx);
        });
        if (h->closing)
            return;
        Buffer& b = h->bufs[h->fill_idx];
        lk.unlock();

        long got = read_block(h, b);

        lk.lock();
        if (got < 0) {
            h->error = true;
            h->cv_consumer.notify_all();
            return;
        }
        b.n_valid = got;
        b.ready = true;
        h->fill_idx = (h->fill_idx + 1) % h->n_buffers;
        bool done = got < h->block_samples;
        if (done)
            h->eof = true;
        h->cv_consumer.notify_all();
        if (done)
            return;
    }
}

}  // namespace

extern "C" {

void* hostio_open(const char* path, int fmt, long block_samples,
                  int n_buffers) {
    if (block_samples <= 0 || n_buffers < 2 || fmt < 0 || fmt > 2)
        return nullptr;
    FILE* f = fopen(path, "rb");
    if (!f)
        return nullptr;
    auto* h = new HostIO();
    h->f = f;
    h->fmt = fmt;
    h->block_samples = block_samples;
    h->n_buffers = n_buffers;
    h->bufs.resize(n_buffers);
    for (auto& b : h->bufs)
        b.data.resize(2 * block_samples);
    if (fmt == 0)
        h->raw8.resize(2 * block_samples);
    else if (fmt == 1)
        h->raw16.resize(2 * block_samples);
    h->reader = std::thread(reader_main, h);
    return h;
}

long hostio_next(void* handle, float** out) {
    auto* h = (HostIO*)handle;
    std::unique_lock<std::mutex> lk(h->mu);
    Buffer& b = h->bufs[h->take_idx];
    h->cv_consumer.wait(lk, [&] {
        return b.ready || h->error
               || (h->eof && !b.ready);
    });
    if (h->error)
        return -1;
    if (!b.ready)
        return 0;                       // EOF, no more data
    *out = b.data.data();
    h->taken_idx = h->take_idx;
    h->take_idx = (h->take_idx + 1) % h->n_buffers;
    return b.n_valid;
}

void hostio_release(void* handle) {
    auto* h = (HostIO*)handle;
    std::lock_guard<std::mutex> lk(h->mu);
    if (h->taken_idx >= 0) {
        h->bufs[h->taken_idx].ready = false;
        h->bufs[h->taken_idx].n_valid = 0;
        h->taken_idx = -1;
        h->cv_reader.notify_all();
    }
}

void hostio_close(void* handle) {
    auto* h = (HostIO*)handle;
    {
        std::lock_guard<std::mutex> lk(h->mu);
        h->closing = true;
        h->cv_reader.notify_all();
    }
    if (h->reader.joinable())
        h->reader.join();
    fclose(h->f);
    delete h;
}

}  // extern "C"
