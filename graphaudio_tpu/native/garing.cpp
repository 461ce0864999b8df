// garing: lock-free SPSC audio ring buffer + realtime output device layer.
//
// Plays the role of the reference's native-memory RingBuffer
// (GraphAudio.Realtime/RingBuffer.cs:9-98: volatile write/read positions,
// split wraparound memcpy, semaphore backpressure) and of miniaudio's device
// layer (GraphAudio.Realtime/Miniaudio.cs). The device callback thread only
// touches native memory — no Python, mirroring the reference's GC-free
// [UnmanagedCallersOnly] discipline (RealtimeAudioContext.cs:167-235).
//
// Backends:
//   * "null": a clock-paced consumer thread that drains the ring in real
//     time (zero-filling underruns and counting them) — usable on any
//     machine, including CI containers with no sound hardware.
//   * ALSA could be added behind the same ABI when libasound is present.
//
// Build: g++ -O2 -shared -fPIC -pthread -o libgaring.so garing.cpp

#include <atomic>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

namespace {

struct Ring {
    std::vector<float> buf;       // capacity * channels interleaved samples
    std::atomic<uint64_t> wpos{0};  // total frames written
    std::atomic<uint64_t> rpos{0};  // total frames read
    uint32_t capacity = 0;          // frames
    uint32_t channels = 0;
    // Semaphore-equivalent backpressure (RingBuffer.cs:51 WaitForSpace).
    std::mutex m;
    std::condition_variable cv;

    uint64_t available_read() const {
        return wpos.load(std::memory_order_acquire) -
               rpos.load(std::memory_order_acquire);
    }
    uint64_t available_write() const { return capacity - available_read(); }
};

struct Device {
    Ring* ring = nullptr;
    uint32_t sample_rate = 48000;
    uint32_t channels = 2;
    uint32_t period_frames = 256;
    std::atomic<bool> running{false};
    std::atomic<bool> quit{false};
    std::atomic<uint64_t> frames_played{0};
    std::atomic<uint64_t> underrun_frames{0};
    std::thread thread;
    std::vector<float> scratch;
    // Optional tap: most recent period is kept for host inspection.
    std::vector<float> tap;
    std::mutex tap_m;
};

void ring_read_into(Ring* r, float* out, uint32_t frames, uint64_t* underrun) {
    uint32_t ch = r->channels;
    uint64_t avail = r->available_read();
    uint32_t take = (uint32_t)(avail < frames ? avail : frames);
    uint64_t rp = r->rpos.load(std::memory_order_relaxed);
    uint32_t start = (uint32_t)(rp % r->capacity);
    uint32_t first = std::min(take, r->capacity - start);
    memcpy(out, r->buf.data() + (size_t)start * ch, (size_t)first * ch * 4);
    if (take > first) {
        memcpy(out + (size_t)first * ch, r->buf.data(),
               (size_t)(take - first) * ch * 4);
    }
    if (take < frames) {  // underrun: zero-fill (RealtimeAudioContext.cs:224-228)
        memset(out + (size_t)take * ch, 0, (size_t)(frames - take) * ch * 4);
        if (underrun) *underrun += frames - take;
    }
    r->rpos.store(rp + take, std::memory_order_release);
    {
        std::lock_guard<std::mutex> lk(r->m);
    }
    r->cv.notify_all();  // release space semaphore
}

void null_device_loop(Device* d) {
    using clock = std::chrono::steady_clock;
    auto period = std::chrono::nanoseconds(
        (uint64_t)d->period_frames * 1000000000ull / d->sample_rate);
    auto next = clock::now() + period;
    while (!d->quit.load(std::memory_order_acquire)) {
        if (!d->running.load(std::memory_order_acquire)) {
            std::this_thread::sleep_for(std::chrono::milliseconds(1));
            next = clock::now() + period;
            continue;
        }
        uint64_t under = 0;
        ring_read_into(d->ring, d->scratch.data(), d->period_frames, &under);
        d->underrun_frames.fetch_add(under, std::memory_order_relaxed);
        d->frames_played.fetch_add(d->period_frames, std::memory_order_relaxed);
        {
            std::lock_guard<std::mutex> lk(d->tap_m);
            d->tap = d->scratch;
        }
        std::this_thread::sleep_until(next);
        next += period;
    }
}

}  // namespace

extern "C" {

// ---- ring buffer ----------------------------------------------------------

void* garing_create(uint32_t channels, uint32_t capacity_frames) {
    Ring* r = new Ring();
    r->channels = channels;
    r->capacity = capacity_frames;
    r->buf.assign((size_t)capacity_frames * channels, 0.0f);
    return r;
}

void garing_destroy(void* h) { delete (Ring*)h; }

uint64_t garing_available_write(void* h) { return ((Ring*)h)->available_write(); }
uint64_t garing_available_read(void* h) { return ((Ring*)h)->available_read(); }

// Write interleaved frames; returns frames actually written
// (split wraparound copy, RingBuffer.cs:56-86).
uint32_t garing_write(void* h, const float* data, uint32_t frames) {
    Ring* r = (Ring*)h;
    uint32_t ch = r->channels;
    uint64_t space = r->available_write();
    uint32_t put = (uint32_t)(space < frames ? space : frames);
    uint64_t wp = r->wpos.load(std::memory_order_relaxed);
    uint32_t start = (uint32_t)(wp % r->capacity);
    uint32_t first = std::min(put, r->capacity - start);
    memcpy(r->buf.data() + (size_t)start * ch, data, (size_t)first * ch * 4);
    if (put > first) {
        memcpy(r->buf.data(), data + (size_t)first * ch,
               (size_t)(put - first) * ch * 4);
    }
    r->wpos.store(wp + put, std::memory_order_release);
    return put;
}

// Read interleaved frames (zero-fills shortfall); returns frames available
// before the read.
uint32_t garing_read(void* h, float* out, uint32_t frames) {
    Ring* r = (Ring*)h;
    uint32_t avail = (uint32_t)std::min<uint64_t>(r->available_read(), frames);
    ring_read_into(r, out, frames, nullptr);
    return avail;
}

// Block until at least `frames` of write space or timeout; returns 1 on space.
int garing_wait_space(void* h, uint32_t frames, uint32_t timeout_ms) {
    Ring* r = (Ring*)h;
    std::unique_lock<std::mutex> lk(r->m);
    bool ok = r->cv.wait_for(lk, std::chrono::milliseconds(timeout_ms),
                             [&] { return r->available_write() >= frames; });
    return ok ? 1 : 0;
}

// ---- device layer -----------------------------------------------------------

void* gadev_open(const char* kind, void* ring, uint32_t sample_rate,
                 uint32_t channels, uint32_t period_frames) {
    (void)kind;  // only the "null" backend exists in this build
    Device* d = new Device();
    d->ring = (Ring*)ring;
    d->sample_rate = sample_rate;
    d->channels = channels;
    d->period_frames = period_frames;
    d->scratch.assign((size_t)period_frames * channels, 0.0f);
    d->thread = std::thread(null_device_loop, d);
    return d;
}

void gadev_start(void* h) { ((Device*)h)->running.store(true); }
void gadev_stop(void* h) { ((Device*)h)->running.store(false); }

void gadev_close(void* h) {
    Device* d = (Device*)h;
    d->quit.store(true);
    d->running.store(false);
    if (d->thread.joinable()) d->thread.join();
    delete d;
}

uint64_t gadev_frames_played(void* h) { return ((Device*)h)->frames_played.load(); }
uint64_t gadev_underruns(void* h) { return ((Device*)h)->underrun_frames.load(); }

// Copy the most recent device period into `out` (period_frames*channels).
void gadev_tap(void* h, float* out) {
    Device* d = (Device*)h;
    std::lock_guard<std::mutex> lk(d->tap_m);
    if (!d->tap.empty()) {
        memcpy(out, d->tap.data(), d->tap.size() * 4);
    }
}

// Backend/device enumeration (miniaudio surface parity, Miniaudio.cs:303-349).
// Writes up to `max` null-separated names into `out`; returns the count.
int gadev_enumerate(char* out, int out_size, int max) {
    const char* names[] = {"null"};
    int n = 0;
    int off = 0;
    for (const char* name : names) {
        int len = (int)strlen(name) + 1;
        if (n >= max || off + len > out_size) break;
        memcpy(out + off, name, len);
        off += len;
        n++;
    }
    return n;
}

}  // extern "C"
