// Test-only decode oracle backed by the system's ffmpeg libraries
// (libavformat/libavcodec). Entirely independent of gacodec.cpp — used by
// tests to cross-validate our native codecs' bitstreams (ALAC-in-CAF,
// FLAC, Ogg) against a second, widely-deployed implementation. Not part
// of the shipped framework; built on demand by tests via
// utils/nativebuild.load_or_build with -lavformat -lavcodec -lavutil.
//
// C API:
//   avo_decode(path, &out_frames, &out_channels, &out_rate) -> float*
//     (interleaved f32; caller frees with avo_free). NULL on failure.

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/opt.h>
#include <libavutil/samplefmt.h>
}

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

// Convert one AVFrame to interleaved f32, appending to out.
bool append_frame(const AVFrame* f, int channels, std::vector<float>& out) {
    const int n = f->nb_samples;
    const AVSampleFormat fmt = (AVSampleFormat)f->format;
    const size_t base = out.size();
    out.resize(base + size_t(n) * channels);
    float* dst = out.data() + base;
    switch (fmt) {
        case AV_SAMPLE_FMT_S16P:
            for (int i = 0; i < n; i++)
                for (int c = 0; c < channels; c++)
                    dst[i * channels + c] =
                        ((const int16_t*)f->extended_data[c])[i] / 32768.0f;
            return true;
        case AV_SAMPLE_FMT_S16: {
            const int16_t* s = (const int16_t*)f->extended_data[0];
            for (int i = 0; i < n * channels; i++) dst[i] = s[i] / 32768.0f;
            return true;
        }
        case AV_SAMPLE_FMT_S32P:
            for (int i = 0; i < n; i++)
                for (int c = 0; c < channels; c++)
                    dst[i * channels + c] = float(
                        ((const int32_t*)f->extended_data[c])[i] /
                        2147483648.0);
            return true;
        case AV_SAMPLE_FMT_S32: {
            const int32_t* s = (const int32_t*)f->extended_data[0];
            for (int i = 0; i < n * channels; i++)
                dst[i] = float(s[i] / 2147483648.0);
            return true;
        }
        case AV_SAMPLE_FMT_FLTP:
            for (int i = 0; i < n; i++)
                for (int c = 0; c < channels; c++)
                    dst[i * channels + c] =
                        ((const float*)f->extended_data[c])[i];
            return true;
        case AV_SAMPLE_FMT_FLT:
            memcpy(dst, f->extended_data[0],
                   size_t(n) * channels * sizeof(float));
            return true;
        default:
            out.resize(base);
            return false;
    }
}

}  // namespace

extern "C" {

float* avo_decode(const char* path, int64_t* out_frames, int* out_channels,
                  int* out_rate) {
    *out_frames = 0;
    *out_channels = 0;
    *out_rate = 0;
    AVFormatContext* fc = nullptr;
    if (avformat_open_input(&fc, path, nullptr, nullptr) < 0) return nullptr;
    float* result = nullptr;
    AVCodecContext* cc = nullptr;
    AVPacket* pkt = nullptr;
    AVFrame* frame = nullptr;
    do {
        if (avformat_find_stream_info(fc, nullptr) < 0) break;
        const AVCodec* dec = nullptr;
        int si = av_find_best_stream(fc, AVMEDIA_TYPE_AUDIO, -1, -1, &dec, 0);
        if (si < 0 || !dec) break;
        AVStream* st = fc->streams[si];
        cc = avcodec_alloc_context3(dec);
        if (!cc) break;
        if (avcodec_parameters_to_context(cc, st->codecpar) < 0) break;
        if (avcodec_open2(cc, dec, nullptr) < 0) break;
        int channels = cc->ch_layout.nb_channels;
        if (channels < 1 || channels > 32) break;
        std::vector<float> samples;
        pkt = av_packet_alloc();
        frame = av_frame_alloc();
        if (!pkt || !frame) break;
        bool ok = true;
        auto drain = [&]() {
            int r;
            while ((r = avcodec_receive_frame(cc, frame)) >= 0) {
                if (!append_frame(frame, channels, samples)) ok = false;
                av_frame_unref(frame);
            }
            return r == AVERROR(EAGAIN) || r == AVERROR_EOF;
        };
        while (av_read_frame(fc, pkt) >= 0) {
            if (pkt->stream_index == si) {
                if (avcodec_send_packet(cc, pkt) < 0) { ok = false; }
                else if (!drain()) ok = false;
            }
            av_packet_unref(pkt);
            if (!ok) break;
        }
        if (ok) {
            avcodec_send_packet(cc, nullptr);  // flush
            drain();
        }
        if (!ok || samples.empty()) break;
        result = (float*)malloc(samples.size() * sizeof(float));
        if (!result) break;
        memcpy(result, samples.data(), samples.size() * sizeof(float));
        *out_frames = int64_t(samples.size() / channels);
        *out_channels = channels;
        *out_rate = cc->sample_rate;
    } while (false);
    if (frame) av_frame_free(&frame);
    if (pkt) av_packet_free(&pkt);
    if (cc) avcodec_free_context(&cc);
    avformat_close_input(&fc);
    return result;
}

void avo_free(float* p) { free(p); }

// Encode interleaved s16 samples as ALAC in CAF with ffmpeg's own encoder
// and muxer — produces independent reference bitstreams for decoder
// cross-validation. Returns 0 on success.
int avo_encode_alac(const char* path, const int16_t* samples, int64_t frames,
                    int channels, int rate) {
    const AVCodec* enc = avcodec_find_encoder(AV_CODEC_ID_ALAC);
    if (!enc) return -1;
    AVFormatContext* oc = nullptr;
    if (avformat_alloc_output_context2(&oc, nullptr, "caf", path) < 0 || !oc)
        return -2;
    int ret = -3;
    AVCodecContext* cc = nullptr;
    AVFrame* frame = nullptr;
    AVPacket* pkt = nullptr;
    do {
        AVStream* st = avformat_new_stream(oc, nullptr);
        if (!st) break;
        cc = avcodec_alloc_context3(enc);
        if (!cc) break;
        cc->sample_rate = rate;
        av_channel_layout_default(&cc->ch_layout, channels);
        cc->sample_fmt = AV_SAMPLE_FMT_S16P;
        if (oc->oformat->flags & AVFMT_GLOBALHEADER)
            cc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
        if (avcodec_open2(cc, enc, nullptr) < 0) break;
        if (avcodec_parameters_from_context(st->codecpar, cc) < 0) break;
        st->time_base = {1, rate};
        if (avio_open(&oc->pb, path, AVIO_FLAG_WRITE) < 0) break;
        if (avformat_write_header(oc, nullptr) < 0) break;
        frame = av_frame_alloc();
        pkt = av_packet_alloc();
        if (!frame || !pkt) break;
        const int fs = cc->frame_size > 0 ? cc->frame_size : 4096;
        int64_t pos = 0;
        bool ok = true;
        auto drain = [&]() {
            int r;
            while ((r = avcodec_receive_packet(cc, pkt)) >= 0) {
                pkt->stream_index = 0;
                if (av_interleaved_write_frame(oc, pkt) < 0) ok = false;
            }
            return r == AVERROR(EAGAIN) || r == AVERROR_EOF;
        };
        while (pos < frames && ok) {
            int n = int(frames - pos > fs ? fs : frames - pos);
            frame->nb_samples = n;
            frame->format = AV_SAMPLE_FMT_S16P;
            av_channel_layout_copy(&frame->ch_layout, &cc->ch_layout);
            if (av_frame_get_buffer(frame, 0) < 0) { ok = false; break; }
            for (int c = 0; c < channels; c++) {
                int16_t* d = (int16_t*)frame->extended_data[c];
                for (int i = 0; i < n; i++)
                    d[i] = samples[(pos + i) * channels + c];
            }
            frame->pts = pos;
            if (avcodec_send_frame(cc, frame) < 0 || !drain()) ok = false;
            av_frame_unref(frame);
            pos += n;
        }
        if (ok) {
            avcodec_send_frame(cc, nullptr);
            drain();
            if (av_write_trailer(oc) == 0) ret = 0;
        }
    } while (false);
    if (frame) av_frame_free(&frame);
    if (pkt) av_packet_free(&pkt);
    if (cc) avcodec_free_context(&cc);
    if (oc) {
        if (oc->pb) avio_closep(&oc->pb);
        avformat_free_context(oc);
    }
    return ret;
}

}  // extern "C"
