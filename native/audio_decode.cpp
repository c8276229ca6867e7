// First-party audio demux/decode shim over the system FFmpeg *libraries*
// (libavformat/libavcodec/libswresample — present in this image even though
// the ffmpeg CLI binary is not). Replaces the role faster-whisper/CTranslate2
// delegated to its bundled ffmpeg in the reference
// (/root/reference/ml-service/src/services/model_manager.py:409-467): hand it
// any container (mp4/mov/mkv/m4a/...) and get 16 kHz mono float32 PCM back.
//
// C ABI (ctypes-friendly, no C++ types across the boundary):
//   eioku_audio_decode(path, target_sr, &buf, &n) -> 0 ok / 1 no audio stream
//       / negative AVERROR-style failure. buf is malloc'd float32 PCM,
//       released with eioku_audio_free.
//   eioku_audio_probe(path) -> 1 has audio stream, 0 none, <0 open failure.
//   eioku_audio_encode(path, samples, n, sr) -> 0 ok / <0 failure. Encodes
//       mono float32 PCM as AAC-LC into the container implied by the path's
//       extension (.m4a/.mp4/.mov). Used by tests to build real AAC fixtures
//       (zero-egress image: no sample media exists to test against otherwise)
//       and by the CLI to extract/re-mux audio tracks.
//
// Build: g++ -O2 -shared -fPIC -std=c++17 audio_decode.cpp
//        -lavformat -lavcodec -lswresample -lavutil
// (eioku_tpu/utils/native_build.py passes the link flags.)

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/channel_layout.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
}

#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct DecoderCtx {
    AVFormatContext *fmt = nullptr;
    AVCodecContext *dec = nullptr;
    SwrContext *swr = nullptr;
    AVPacket *pkt = nullptr;
    AVFrame *frame = nullptr;
    ~DecoderCtx() {
        if (swr) swr_free(&swr);
        if (dec) avcodec_free_context(&dec);
        if (fmt) avformat_close_input(&fmt);
        if (pkt) av_packet_free(&pkt);
        if (frame) av_frame_free(&frame);
    }
};

// Drain whatever swr holds/needs for one input frame into out.
int convert_into(SwrContext *swr, std::vector<float> &out, const AVFrame *in,
                 int target_sr) {
    const uint8_t **in_data = in ? (const uint8_t **)in->extended_data : nullptr;
    int in_count = in ? in->nb_samples : 0;
    // worst-case output bound for this conversion step
    int64_t delay = swr_get_delay(swr, target_sr);
    int max_out = (int)av_rescale_rnd(delay + in_count, target_sr,
                                      in ? in->sample_rate : target_sr,
                                      AV_ROUND_UP) + 64;
    size_t base = out.size();
    out.resize(base + (size_t)max_out);
    uint8_t *out_planes[1] = {(uint8_t *)(out.data() + base)};
    int got = swr_convert(swr, out_planes, max_out, in_data, in_count);
    if (got < 0) return got;
    out.resize(base + (size_t)got);
    return 0;
}

}  // namespace

extern "C" {

void eioku_audio_free(float *p) { free(p); }

int eioku_audio_probe(const char *path) {
    AVFormatContext *fmt = nullptr;
    if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
    int found = 0;
    if (avformat_find_stream_info(fmt, nullptr) >= 0 &&
        av_find_best_stream(fmt, AVMEDIA_TYPE_AUDIO, -1, -1, nullptr, 0) >= 0)
        found = 1;
    avformat_close_input(&fmt);
    return found;
}

int eioku_audio_decode(const char *path, int target_sr, float **out_buf,
                       long long *out_n) {
    *out_buf = nullptr;
    *out_n = 0;
    DecoderCtx c;
    int ret = avformat_open_input(&c.fmt, path, nullptr, nullptr);
    if (ret < 0) return ret;
    if ((ret = avformat_find_stream_info(c.fmt, nullptr)) < 0) return ret;
    const AVCodec *codec = nullptr;
    int stream = av_find_best_stream(c.fmt, AVMEDIA_TYPE_AUDIO, -1, -1,
                                     &codec, 0);
    if (stream < 0 || !codec) return 1;  // container has no decodable audio
    AVStream *st = c.fmt->streams[stream];

    c.dec = avcodec_alloc_context3(codec);
    if (!c.dec) return AVERROR(ENOMEM);
    if ((ret = avcodec_parameters_to_context(c.dec, st->codecpar)) < 0)
        return ret;
    if ((ret = avcodec_open2(c.dec, codec, nullptr)) < 0) return ret;
    if (c.dec->ch_layout.nb_channels == 0)
        av_channel_layout_default(&c.dec->ch_layout, 1);

    AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
    ret = swr_alloc_set_opts2(&c.swr, &mono, AV_SAMPLE_FMT_FLT, target_sr,
                              &c.dec->ch_layout, c.dec->sample_fmt,
                              c.dec->sample_rate, 0, nullptr);
    if (ret < 0 || (ret = swr_init(c.swr)) < 0) return ret;

    c.pkt = av_packet_alloc();
    c.frame = av_frame_alloc();
    if (!c.pkt || !c.frame) return AVERROR(ENOMEM);

    std::vector<float> pcm;
    pcm.reserve((size_t)target_sr * 16);
    bool eof = false;
    while (!eof) {
        ret = av_read_frame(c.fmt, c.pkt);
        if (ret == AVERROR_EOF) {
            eof = true;
        } else if (ret < 0) {
            return ret;
        } else if (c.pkt->stream_index != stream) {
            av_packet_unref(c.pkt);
            continue;
        }
        ret = avcodec_send_packet(c.dec, eof ? nullptr : c.pkt);
        av_packet_unref(c.pkt);
        if (ret < 0 && ret != AVERROR_EOF) return ret;
        while ((ret = avcodec_receive_frame(c.dec, c.frame)) >= 0) {
            if ((ret = convert_into(c.swr, pcm, c.frame, target_sr)) < 0)
                return ret;
            av_frame_unref(c.frame);
        }
        if (ret != AVERROR(EAGAIN) && ret != AVERROR_EOF) return ret;
    }
    // flush the resampler's delay line
    if ((ret = convert_into(c.swr, pcm, nullptr, target_sr)) < 0) return ret;

    float *buf = (float *)malloc(pcm.size() * sizeof(float));
    if (!buf && !pcm.empty()) return AVERROR(ENOMEM);
    memcpy(buf, pcm.data(), pcm.size() * sizeof(float));
    *out_buf = buf;
    *out_n = (long long)pcm.size();
    return 0;
}

int eioku_audio_encode(const char *path, const float *samples, long long n,
                       int sr) {
    AVFormatContext *oc = nullptr;
    int ret = avformat_alloc_output_context2(&oc, nullptr, nullptr, path);
    if (ret < 0 || !oc) return ret < 0 ? ret : AVERROR(EINVAL);

    const AVCodec *codec = avcodec_find_encoder(AV_CODEC_ID_AAC);
    AVCodecContext *enc = codec ? avcodec_alloc_context3(codec) : nullptr;
    SwrContext *swr = nullptr;
    AVFrame *frame = nullptr;
    AVPacket *pkt = nullptr;
    bool opened_io = false;
    ret = codec && enc ? 0 : AVERROR(ENOMEM);

    if (ret >= 0) {
        enc->sample_rate = sr;
        enc->sample_fmt = AV_SAMPLE_FMT_FLTP;  // the native aac encoder's fmt
        av_channel_layout_default(&enc->ch_layout, 1);
        enc->bit_rate = 64000;
        enc->time_base = AVRational{1, sr};
        if (oc->oformat->flags & AVFMT_GLOBALHEADER)
            enc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
        ret = avcodec_open2(enc, codec, nullptr);
    }
    AVStream *st = nullptr;
    if (ret >= 0) {
        st = avformat_new_stream(oc, nullptr);
        if (!st) ret = AVERROR(ENOMEM);
        else {
            st->time_base = enc->time_base;
            ret = avcodec_parameters_from_context(st->codecpar, enc);
        }
    }
    if (ret >= 0) {
        // mono float32 interleaved == planar for 1 channel, but go through
        // swr anyway so the frame layout is exactly what the encoder expects
        AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
        ret = swr_alloc_set_opts2(&swr, &enc->ch_layout, enc->sample_fmt, sr,
                                  &mono, AV_SAMPLE_FMT_FLT, sr, 0, nullptr);
        if (ret >= 0) ret = swr_init(swr);
    }
    if (ret >= 0 && !(oc->oformat->flags & AVFMT_NOFILE)) {
        ret = avio_open(&oc->pb, path, AVIO_FLAG_WRITE);
        opened_io = ret >= 0;
    }
    if (ret >= 0) ret = avformat_write_header(oc, nullptr);

    if (ret >= 0) {
        frame = av_frame_alloc();
        pkt = av_packet_alloc();
        if (!frame || !pkt) ret = AVERROR(ENOMEM);
    }
    long long pos = 0;
    int64_t pts = 0;
    const int fsz = ret >= 0 ? enc->frame_size : 0;
    while (ret >= 0) {
        bool flushing = pos >= n;
        if (!flushing) {
            frame->nb_samples = fsz;
            frame->format = enc->sample_fmt;
            av_channel_layout_copy(&frame->ch_layout, &enc->ch_layout);
            frame->sample_rate = sr;
            if ((ret = av_frame_get_buffer(frame, 0)) < 0) break;
            int take = (int)((n - pos) < fsz ? (n - pos) : fsz);
            std::vector<float> in((size_t)fsz, 0.0f);  // zero-pad tail frame
            memcpy(in.data(), samples + pos, (size_t)take * sizeof(float));
            const uint8_t *in_planes[1] = {(const uint8_t *)in.data()};
            ret = swr_convert(swr, frame->extended_data, fsz, in_planes, fsz);
            if (ret < 0) break;
            frame->pts = pts;
            pts += fsz;
            pos += fsz;
        }
        ret = avcodec_send_frame(enc, flushing ? nullptr : frame);
        if (!flushing) av_frame_unref(frame);
        if (ret < 0) break;
        while ((ret = avcodec_receive_packet(enc, pkt)) >= 0) {
            av_packet_rescale_ts(pkt, enc->time_base, st->time_base);
            pkt->stream_index = st->index;
            ret = av_interleaved_write_frame(oc, pkt);
            av_packet_unref(pkt);
            if (ret < 0) break;
        }
        if (ret == AVERROR(EAGAIN)) { ret = 0; continue; }
        if (ret == AVERROR_EOF) { ret = 0; break; }
        if (ret < 0) break;
    }
    if (ret >= 0) ret = av_write_trailer(oc);
    else if (opened_io) av_write_trailer(oc);  // best-effort finalize on error

    if (frame) av_frame_free(&frame);
    if (pkt) av_packet_free(&pkt);
    if (swr) swr_free(&swr);
    if (enc) avcodec_free_context(&enc);
    if (opened_io) avio_closep(&oc->pb);
    avformat_free_context(oc);
    return ret < 0 ? ret : 0;
}

}  // extern "C"
