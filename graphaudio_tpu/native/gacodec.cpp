// gacodec: native audio codec backend for graphaudio_tpu.
//
// Plays the role libsndfile plays for the reference
// (GraphAudio.IO/Libsndfile.cs:26-68 binds sf_open_virtual/sf_readf_float/...):
// container parsing + PCM decode off the render hot path, exposed through a
// minimal C ABI consumed via ctypes.
//
// Formats: RIFF/WAVE (PCM u8/s16/s24/s32, float32/float64, WAVE_FORMAT_EXTENSIBLE)
// and AIFF/AIFC (PCM s8/s16/s24/s32). Decoding converts to interleaved
// float32 frames, with sample-accurate seeking.
//
// Build: g++ -O2 -shared -fPIC -o libgacodec.so gacodec.cpp

#include <cstdint>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <vector>

namespace {

struct Decoder {
    FILE* file = nullptr;
    const uint8_t* mem = nullptr;  // memory-backed alternative
    size_t mem_size = 0;
    size_t mem_pos = 0;

    // format info
    int channels = 0;
    int sample_rate = 0;
    int bits = 0;
    int format = 0;          // 1 = pcm int, 3 = float, 4 = aiff pcm (big endian)
    int64_t data_start = 0;  // byte offset of sample data
    int64_t total_frames = 0;
    int64_t frame_pos = 0;   // current frame position

    size_t bytes_per_frame() const { return size_t(channels) * (bits / 8); }
};

bool dread(Decoder* d, void* out, size_t n) {
    if (d->file) return fread(out, 1, n, d->file) == n;
    if (d->mem_pos + n > d->mem_size) return false;
    memcpy(out, d->mem + d->mem_pos, n);
    d->mem_pos += n;
    return true;
}

bool dseek(Decoder* d, int64_t pos) {
    if (d->file) return fseeko(d->file, pos, SEEK_SET) == 0;
    if (pos < 0 || size_t(pos) > d->mem_size) return false;
    d->mem_pos = size_t(pos);
    return true;
}

int64_t dtell(Decoder* d) {
    if (d->file) return ftello(d->file);
    return int64_t(d->mem_pos);
}

uint32_t rd_u32le(const uint8_t* p) {
    return uint32_t(p[0]) | (uint32_t(p[1]) << 8) | (uint32_t(p[2]) << 16) |
           (uint32_t(p[3]) << 24);
}
uint16_t rd_u16le(const uint8_t* p) { return uint16_t(p[0]) | (uint16_t(p[1]) << 8); }
uint32_t rd_u32be(const uint8_t* p) {
    return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) | (uint32_t(p[2]) << 8) |
           uint32_t(p[3]);
}
uint16_t rd_u16be(const uint8_t* p) { return (uint16_t(p[0]) << 8) | uint16_t(p[1]); }

// 80-bit IEEE extended (AIFF sample rate)
double read_extended(const uint8_t* p) {
    int sign = (p[0] & 0x80) ? -1 : 1;
    int exponent = ((p[0] & 0x7f) << 8) | p[1];
    uint64_t mantissa = 0;
    for (int i = 2; i < 10; i++) mantissa = (mantissa << 8) | p[i];
    if (exponent == 0 && mantissa == 0) return 0.0;
    return sign * double(mantissa) * pow(2.0, exponent - 16383 - 63);
}

bool parse_wav(Decoder* d) {
    uint8_t hdr[12];
    if (!dseek(d, 0) || !dread(d, hdr, 12)) return false;
    if (memcmp(hdr, "RIFF", 4) != 0 || memcmp(hdr + 8, "WAVE", 4) != 0) return false;

    bool have_fmt = false;
    while (true) {
        uint8_t ch[8];
        if (!dread(d, ch, 8)) break;
        uint32_t size = rd_u32le(ch + 4);
        if (memcmp(ch, "fmt ", 4) == 0) {
            std::vector<uint8_t> fmt(size);
            if (!dread(d, fmt.data(), size)) return false;
            uint16_t tag = rd_u16le(fmt.data());
            d->channels = rd_u16le(fmt.data() + 2);
            d->sample_rate = int(rd_u32le(fmt.data() + 4));
            d->bits = rd_u16le(fmt.data() + 14);
            if (tag == 0xFFFE && size >= 40) {  // WAVE_FORMAT_EXTENSIBLE
                tag = rd_u16le(fmt.data() + 24);
            }
            if (tag == 1) d->format = 1;       // PCM
            else if (tag == 3) d->format = 3;  // IEEE float
            else return false;
            have_fmt = true;
            if (size & 1) dseek(d, dtell(d) + 1);
        } else if (memcmp(ch, "data", 4) == 0) {
            if (!have_fmt) return false;
            d->data_start = dtell(d);
            d->total_frames = int64_t(size) / int64_t(d->bytes_per_frame());
            return d->channels > 0 && d->sample_rate > 0 &&
                   (d->bits == 8 || d->bits == 16 || d->bits == 24 ||
                    d->bits == 32 || d->bits == 64);
        } else {
            if (!dseek(d, dtell(d) + size + (size & 1))) return false;
        }
    }
    return false;
}

bool parse_aiff(Decoder* d) {
    uint8_t hdr[12];
    if (!dseek(d, 0) || !dread(d, hdr, 12)) return false;
    if (memcmp(hdr, "FORM", 4) != 0 ||
        (memcmp(hdr + 8, "AIFF", 4) != 0 && memcmp(hdr + 8, "AIFC", 4) != 0))
        return false;

    bool have_comm = false;
    while (true) {
        uint8_t ch[8];
        if (!dread(d, ch, 8)) break;
        uint32_t size = rd_u32be(ch + 4);
        if (memcmp(ch, "COMM", 4) == 0) {
            std::vector<uint8_t> comm(size);
            if (!dread(d, comm.data(), size)) return false;
            d->channels = rd_u16be(comm.data());
            d->total_frames = int64_t(rd_u32be(comm.data() + 2));
            d->bits = rd_u16be(comm.data() + 6);
            d->sample_rate = int(read_extended(comm.data() + 8));
            if (size >= 22 && memcmp(comm.data() + 18, "NONE", 4) != 0 &&
                memcmp(comm.data() + 18, "sowt", 4) != 0)
                return false;  // compressed AIFC unsupported
            d->format = 4;  // big-endian pcm
            have_comm = true;
            if (size & 1) dseek(d, dtell(d) + 1);
        } else if (memcmp(ch, "SSND", 4) == 0) {
            if (!have_comm) return false;
            uint8_t ssnd[8];
            if (!dread(d, ssnd, 8)) return false;
            uint32_t offset = rd_u32be(ssnd);
            d->data_start = dtell(d) + offset;
            return d->channels > 0 && d->sample_rate > 0 &&
                   (d->bits == 8 || d->bits == 16 || d->bits == 24 || d->bits == 32);
        } else {
            if (!dseek(d, dtell(d) + size + (size & 1))) return false;
        }
    }
    return false;
}

bool parse(Decoder* d) { return parse_wav(d) || parse_aiff(d); }

inline float cvt_sample(const uint8_t* p, int bits, int format) {
    if (format == 3) {  // IEEE float little endian
        if (bits == 32) {
            float v;
            memcpy(&v, p, 4);
            return v;
        }
        double v;
        memcpy(&v, p, 8);
        return float(v);
    }
    bool be = (format == 4);
    switch (bits) {
        case 8:
            // WAV 8-bit is unsigned; AIFF 8-bit is signed.
            return be ? float(int8_t(p[0])) / 128.0f
                      : (float(p[0]) - 128.0f) / 128.0f;
        case 16: {
            int16_t v = be ? int16_t((p[0] << 8) | p[1]) : int16_t(p[0] | (p[1] << 8));
            return float(v) / 32768.0f;
        }
        case 24: {
            int32_t v = be ? int32_t((p[0] << 24) | (p[1] << 16) | (p[2] << 8))
                           : int32_t((p[2] << 24) | (p[1] << 16) | (p[0] << 8));
            return float(v >> 8) / 8388608.0f;
        }
        case 32: {
            int32_t v = be ? int32_t(rd_u32be(p)) : int32_t(rd_u32le(p));
            return float(double(v) / 2147483648.0);
        }
    }
    return 0.0f;
}

}  // namespace

extern "C" {

void* gac_open_file(const char* path) {
    Decoder* d = new Decoder();
    d->file = fopen(path, "rb");
    if (!d->file || !parse(d)) {
        if (d->file) fclose(d->file);
        delete d;
        return nullptr;
    }
    dseek(d, d->data_start);
    return d;
}

void* gac_open_memory(const uint8_t* data, size_t size) {
    Decoder* d = new Decoder();
    d->mem = data;
    d->mem_size = size;
    if (!parse(d)) {
        delete d;
        return nullptr;
    }
    dseek(d, d->data_start);
    return d;
}

int gac_channels(void* h) { return ((Decoder*)h)->channels; }
int gac_sample_rate(void* h) { return ((Decoder*)h)->sample_rate; }
int64_t gac_frames(void* h) { return ((Decoder*)h)->total_frames; }

// Read up to `frames` interleaved float32 frames; returns frames read.
int64_t gac_read_f32(void* h, float* out, int64_t frames) {
    Decoder* d = (Decoder*)h;
    int64_t avail = d->total_frames - d->frame_pos;
    if (frames > avail) frames = avail;
    if (frames <= 0) return 0;
    size_t bpf = d->bytes_per_frame();
    size_t bps = size_t(d->bits / 8);
    std::vector<uint8_t> buf(size_t(frames) * bpf);
    if (!dread(d, buf.data(), buf.size())) {
        // Partial read tolerance: recompute from actual position.
        return 0;
    }
    const uint8_t* p = buf.data();
    int64_t n = frames * d->channels;
    for (int64_t i = 0; i < n; i++, p += bps) {
        out[i] = cvt_sample(p, d->bits, d->format);
    }
    d->frame_pos += frames;
    return frames;
}

// Seek to an absolute frame. Returns 0 on success.
int gac_seek(void* h, int64_t frame) {
    Decoder* d = (Decoder*)h;
    if (frame < 0) frame = 0;
    if (frame > d->total_frames) frame = d->total_frames;
    if (!dseek(d, d->data_start + frame * int64_t(d->bytes_per_frame()))) return -1;
    d->frame_pos = frame;
    return 0;
}

int64_t gac_tell(void* h) { return ((Decoder*)h)->frame_pos; }

void gac_close(void* h) {
    Decoder* d = (Decoder*)h;
    if (d->file) fclose(d->file);
    delete d;
}

// Encode interleaved float32 frames as a PCM16 or float32 WAV file.
// fmt: 1 = pcm16, 3 = float32. Returns 0 on success.
int gac_write_wav(const char* path, const float* data, int64_t frames,
                  int channels, int sample_rate, int fmt) {
    FILE* f = fopen(path, "wb");
    if (!f) return -1;
    int bits = (fmt == 3) ? 32 : 16;
    uint32_t data_size = uint32_t(frames * channels * (bits / 8));
    uint8_t hdr[44];
    memcpy(hdr, "RIFF", 4);
    uint32_t riff = 36 + data_size;
    memcpy(hdr + 4, &riff, 4);
    memcpy(hdr + 8, "WAVEfmt ", 8);
    uint32_t fmtsize = 16;
    memcpy(hdr + 16, &fmtsize, 4);
    uint16_t tag = uint16_t(fmt);
    memcpy(hdr + 20, &tag, 2);
    uint16_t ch = uint16_t(channels);
    memcpy(hdr + 22, &ch, 2);
    uint32_t sr = uint32_t(sample_rate);
    memcpy(hdr + 24, &sr, 4);
    uint32_t brate = sr * channels * (bits / 8);
    memcpy(hdr + 28, &brate, 4);
    uint16_t align = uint16_t(channels * (bits / 8));
    memcpy(hdr + 32, &align, 2);
    uint16_t b = uint16_t(bits);
    memcpy(hdr + 34, &b, 2);
    memcpy(hdr + 36, "data", 4);
    memcpy(hdr + 40, &data_size, 4);
    fwrite(hdr, 1, 44, f);

    int64_t n = frames * channels;
    if (fmt == 3) {
        fwrite(data, 4, size_t(n), f);
    } else {
        std::vector<int16_t> pcm{};
        pcm.resize(size_t(n));
        for (int64_t i = 0; i < n; i++) {
            float v = data[i];
            if (v > 1.0f) v = 1.0f;
            if (v < -1.0f) v = -1.0f;
            pcm[size_t(i)] = int16_t(v * 32767.0f);
        }
        fwrite(pcm.data(), 2, size_t(n), f);
    }
    fclose(f);
    return 0;
}

}  // extern "C"
