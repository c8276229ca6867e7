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
//   eioku_media_encode(path, rgb, n_frames, w, h, fps, samples, n, sr,
//       video_codec) -> 0 ok / <0 failure. Muxes video (encoder by libav
//       name, NULL = libx264) and/or an AAC-LC audio track into one
//       container — the shape real-world library files take (the
//       reference's inputs are camera/screen-recorder mp4s). Tests build
//       H.264/HEVC/VP9 fixtures with it; the CLI exports clips.
//   eioku_media_encode_mapped(...) — same, plus an optional frame_map:
//       output frame i reads rgb[frame_map[i]]. Long synthetic fixtures
//       with few distinct frames then need MBs, not GBs, of frame buffer.
//
// Build: g++ -O2 -shared -fPIC -std=c++17 audio_decode.cpp
//        -lavformat -lavcodec -lswresample -lswscale -lavutil
// (eioku_tpu/utils/native_build.py passes the link flags.)

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/channel_layout.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
#include <libswscale/swscale.h>
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
    if (avformat_find_stream_info(fmt, nullptr) >= 0) {
        // require a *decodable* stream (same test decode applies), so an
        // undecodable track never shadows a usable sidecar file
        const AVCodec *codec = nullptr;
        if (av_find_best_stream(fmt, AVMEDIA_TYPE_AUDIO, -1, -1, &codec,
                                0) >= 0 && codec)
            found = 1;
    }
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
        if (ret < 0) {
            // EOF, or a truncated/corrupt tail: flush and keep what decoded
            eof = true;
        } else if (c.pkt->stream_index != stream) {
            av_packet_unref(c.pkt);
            continue;
        }
        ret = avcodec_send_packet(c.dec, eof ? nullptr : c.pkt);
        av_packet_unref(c.pkt);
        if (ret < 0 && ret != AVERROR_EOF && !eof)
            continue;  // skip a corrupt packet, keep decoding
        while ((ret = avcodec_receive_frame(c.dec, c.frame)) >= 0) {
            if ((ret = convert_into(c.swr, pcm, c.frame, target_sr)) < 0)
                return ret;
            av_frame_unref(c.frame);
        }
        if (ret != AVERROR(EAGAIN) && ret != AVERROR_EOF && !eof) return ret;
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

int eioku_media_encode_ex(const char *path, const unsigned char *rgb,
                          const int *frame_map, int n_frames, int w,
                          int h, double fps, const float *samples,
                          long long n_samples, int sr,
                          const char *video_codec, long long video_bitrate,
                          const char *preset);

int eioku_audio_encode(const char *path, const float *samples, long long n,
                       int sr) {
    return eioku_media_encode_ex(path, nullptr, nullptr, 0, 0, 0, 0.0,
                                 samples, n, sr, nullptr, 0, nullptr);
}

int eioku_media_encode(const char *path, const unsigned char *rgb,
                       int n_frames, int w, int h, double fps,
                       const float *samples, long long n_samples, int sr,
                       const char *video_codec) {
    return eioku_media_encode_ex(path, rgb, nullptr, n_frames, w, h, fps,
                                 samples, n_samples, sr, video_codec, 0,
                                 nullptr);
}

int eioku_media_encode_mapped(const char *path, const unsigned char *rgb,
                              const int *frame_map, int n_frames, int w,
                              int h, double fps, const float *samples,
                              long long n_samples, int sr,
                              const char *video_codec) {
    return eioku_media_encode_ex(path, rgb, frame_map, n_frames, w, h, fps,
                                 samples, n_samples, sr, video_codec, 0,
                                 nullptr);
}

// _ex: video_bitrate <= 0 -> 800 kbps (the cheap-fixture default);
// preset NULL -> "ultrafast". Realistic-content fixtures (1080p bench clip)
// pass a camera-class bitrate (8-16 Mbps) so the decoder pays the bit
// parsing real files cost.
int eioku_media_encode_ex(const char *path, const unsigned char *rgb,
                          const int *frame_map, int n_frames, int w,
                          int h, double fps, const float *samples,
                          long long n_samples, int sr,
                          const char *video_codec, long long video_bitrate,
                          const char *preset) {
    AVFormatContext *oc = nullptr;
    int ret = avformat_alloc_output_context2(&oc, nullptr, nullptr, path);
    if (ret < 0 || !oc) return ret < 0 ? ret : AVERROR(EINVAL);

    AVCodecContext *venc = nullptr, *aenc = nullptr;
    AVStream *vst = nullptr, *ast = nullptr;
    SwsContext *sws = nullptr;
    SwrContext *swr = nullptr;
    AVFrame *vframe = nullptr, *aframe = nullptr;
    AVPacket *pkt = av_packet_alloc();
    bool opened_io = false;
    bool header_written = false;
    ret = pkt ? 0 : AVERROR(ENOMEM);

    const bool want_video = rgb && n_frames > 0;
    const bool want_audio = samples && n_samples > 0;
    const AVRational vtb{1, (int)(fps * 1000 + 0.5)};  // ms-scale video tb

    if (ret >= 0 && want_video) {
        // codec by name (hevc/vp9/av1 fixtures for decode-breadth tests);
        // default H.264, the dominant real-world library codec
        const AVCodec *vc = video_codec
            ? avcodec_find_encoder_by_name(video_codec) : nullptr;
        if (!vc) vc = avcodec_find_encoder_by_name("libx264");
        if (!vc) vc = avcodec_find_encoder_by_name("mpeg4");
        venc = vc ? avcodec_alloc_context3(vc) : nullptr;
        if (!venc) ret = AVERROR(ENOMEM);
        else {
            venc->width = w;
            venc->height = h;
            venc->pix_fmt = AV_PIX_FMT_YUV420P;
            venc->time_base = vtb;
            venc->framerate = AVRational{(int)(fps * 1000 + 0.5), 1000};
            if (oc->oformat->flags & AVFMT_GLOBALHEADER)
                venc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
            venc->bit_rate = video_bitrate > 0 ? video_bitrate
                                               : 800000;  // vp9/av1: CQ
            if (venc->priv_data) {
                av_opt_set(venc->priv_data, "preset",
                           preset ? preset : "ultrafast", 0);
                av_opt_set(venc->priv_data, "deadline", "realtime", 0);
                av_opt_set(venc->priv_data, "cpu-used", "8", 0);
            }
            ret = avcodec_open2(venc, vc, nullptr);
            if (ret >= 0) {
                vst = avformat_new_stream(oc, nullptr);
                if (!vst) ret = AVERROR(ENOMEM);
                else {
                    vst->time_base = venc->time_base;
                    ret = avcodec_parameters_from_context(vst->codecpar, venc);
                }
            }
            if (ret >= 0) {
                sws = sws_getContext(w, h, AV_PIX_FMT_RGB24, w, h,
                                     AV_PIX_FMT_YUV420P, SWS_BILINEAR,
                                     nullptr, nullptr, nullptr);
                vframe = av_frame_alloc();
                if (!sws || !vframe) ret = AVERROR(ENOMEM);
                else {
                    vframe->format = AV_PIX_FMT_YUV420P;
                    vframe->width = w;
                    vframe->height = h;
                    ret = av_frame_get_buffer(vframe, 0);
                }
            }
        }
    }
    if (ret >= 0 && want_audio) {
        const AVCodec *ac = avcodec_find_encoder(AV_CODEC_ID_AAC);
        aenc = ac ? avcodec_alloc_context3(ac) : nullptr;
        if (!aenc) ret = AVERROR(ENOMEM);
        else {
            aenc->sample_rate = sr;
            aenc->sample_fmt = AV_SAMPLE_FMT_FLTP;
            av_channel_layout_default(&aenc->ch_layout, 1);
            aenc->bit_rate = 64000;
            aenc->time_base = AVRational{1, sr};
            if (oc->oformat->flags & AVFMT_GLOBALHEADER)
                aenc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
            ret = avcodec_open2(aenc, ac, nullptr);
            if (ret >= 0) {
                ast = avformat_new_stream(oc, nullptr);
                if (!ast) ret = AVERROR(ENOMEM);
                else {
                    ast->time_base = aenc->time_base;
                    ret = avcodec_parameters_from_context(ast->codecpar, aenc);
                }
            }
            if (ret >= 0) {
                AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
                ret = swr_alloc_set_opts2(&swr, &aenc->ch_layout,
                                          aenc->sample_fmt, sr, &mono,
                                          AV_SAMPLE_FMT_FLT, sr, 0, nullptr);
                if (ret >= 0) ret = swr_init(swr);
                aframe = av_frame_alloc();
                if (ret >= 0 && !aframe) ret = AVERROR(ENOMEM);
            }
        }
    }
    if (ret >= 0 && !vst && !ast) ret = AVERROR(EINVAL);
    if (ret >= 0 && !(oc->oformat->flags & AVFMT_NOFILE)) {
        ret = avio_open(&oc->pb, path, AVIO_FLAG_WRITE);
        opened_io = ret >= 0;
    }
    if (ret >= 0) {
        ret = avformat_write_header(oc, nullptr);
        header_written = ret >= 0;
    }

    // drain one encoder's ready packets into the muxer
    auto drain = [&](AVCodecContext *enc, AVStream *st) {
        int r;
        while ((r = avcodec_receive_packet(enc, pkt)) >= 0) {
            av_packet_rescale_ts(pkt, enc->time_base, st->time_base);
            pkt->stream_index = st->index;
            r = av_interleaved_write_frame(oc, pkt);
            av_packet_unref(pkt);
            if (r < 0) return r;
        }
        return r == AVERROR(EAGAIN) || r == AVERROR_EOF ? 0 : r;
    };

    // feed both encoders in presentation order so the muxer interleaves
    // without unbounded buffering
    int vi = 0;
    long long apos = 0;
    const int afsz = aenc ? aenc->frame_size : 0;
    while (ret >= 0 && ((want_video && vi < n_frames) ||
                        (want_audio && apos < n_samples))) {
        double v_t = want_video && vi < n_frames ? vi / fps : 1e30;
        double a_t = want_audio && apos < n_samples ? (double)apos / sr : 1e30;
        if (v_t <= a_t) {
            if ((ret = av_frame_make_writable(vframe)) < 0) break;
            size_t fidx = frame_map ? (size_t)frame_map[vi] : (size_t)vi;
            const uint8_t *src[1] = {rgb + fidx * h * w * 3};
            const int src_stride[1] = {w * 3};
            sws_scale(sws, src, src_stride, 0, h, vframe->data,
                      vframe->linesize);
            // time_base is 1/(fps*1000): frame vi at vi/fps s == pts vi*1000
            vframe->pts = (int64_t)vi * 1000;
            vi++;
            if ((ret = avcodec_send_frame(venc, vframe)) < 0) break;
            if ((ret = drain(venc, vst)) < 0) break;
        } else {
            aframe->nb_samples = afsz;
            aframe->format = aenc->sample_fmt;
            av_channel_layout_copy(&aframe->ch_layout, &aenc->ch_layout);
            aframe->sample_rate = sr;
            if ((ret = av_frame_get_buffer(aframe, 0)) < 0) break;
            int take = (int)((n_samples - apos) < afsz ? (n_samples - apos)
                                                       : afsz);
            std::vector<float> in((size_t)afsz, 0.0f);
            memcpy(in.data(), samples + apos, (size_t)take * sizeof(float));
            const uint8_t *in_planes[1] = {(const uint8_t *)in.data()};
            if ((ret = swr_convert(swr, aframe->extended_data, afsz,
                                   in_planes, afsz)) < 0)
                break;
            aframe->pts = apos;
            apos += afsz;
            ret = avcodec_send_frame(aenc, aframe);
            av_frame_unref(aframe);
            if (ret < 0) break;
            if ((ret = drain(aenc, ast)) < 0) break;
        }
    }
    if (ret >= 0 && venc) {
        if ((ret = avcodec_send_frame(venc, nullptr)) >= 0 ||
            ret == AVERROR_EOF)
            ret = drain(venc, vst);
    }
    if (ret >= 0 && aenc) {
        if ((ret = avcodec_send_frame(aenc, nullptr)) >= 0 ||
            ret == AVERROR_EOF)
            ret = drain(aenc, ast);
    }
    // av_write_trailer is only valid after a successful write_header
    if (header_written) av_write_trailer(oc);

    if (vframe) av_frame_free(&vframe);
    if (aframe) av_frame_free(&aframe);
    if (pkt) av_packet_free(&pkt);
    if (sws) sws_freeContext(sws);
    if (swr) swr_free(&swr);
    if (venc) avcodec_free_context(&venc);
    if (aenc) avcodec_free_context(&aenc);
    if (opened_io) avio_closep(&oc->pb);
    avformat_free_context(oc);
    return ret < 0 ? ret : 0;
}

// eioku_clip_remux(src, dst, start_ms, end_ms) -> 0 ok / <0 failure.
// Stream-copy every A/V stream of [start, end] into dst (container from the
// extension) WITHOUT re-encoding: export of a search-hit clip costs ms, not
// a transcode. Cut points snap to the keyframe at-or-before start_ms (the
// only cut a copy can make playable); timestamps rebase so the clip starts
// near zero.
int eioku_clip_remux(const char *src, const char *dst,
                     long long start_ms, long long end_ms) {
    if (end_ms <= start_ms) return -1;
    AVFormatContext *ic = nullptr, *oc = nullptr;
    AVPacket *pkt = nullptr;
    int ret = 0, wrote = 0;
    bool header_written = false, opened_io = false;
    // ONE origin for every stream (the anchor keyframe's time): per-stream
    // rebase would shift video and audio by different amounts and desync
    // the clip by the keyframe-snap distance
    long long origin_ms = AV_NOPTS_VALUE;
    bool have_video = false;
    std::vector<int> map;           // input stream index -> output (-1 drop)

    if ((ret = avformat_open_input(&ic, src, nullptr, nullptr)) < 0) return ret;
    if ((ret = avformat_find_stream_info(ic, nullptr)) < 0) goto done;
    if ((ret = avformat_alloc_output_context2(&oc, nullptr, nullptr, dst)) < 0)
        goto done;

    map.assign(ic->nb_streams, -1);
    for (unsigned i = 0; i < ic->nb_streams; i++) {
        AVCodecParameters *par = ic->streams[i]->codecpar;
        if (par->codec_type != AVMEDIA_TYPE_VIDEO &&
            par->codec_type != AVMEDIA_TYPE_AUDIO)
            continue;
        if (par->codec_type == AVMEDIA_TYPE_VIDEO) have_video = true;
        AVStream *os = avformat_new_stream(oc, nullptr);
        if (!os) { ret = AVERROR(ENOMEM); goto done; }
        if ((ret = avcodec_parameters_copy(os->codecpar, par)) < 0) goto done;
        os->codecpar->codec_tag = 0;  // container-appropriate tag
        os->time_base = ic->streams[i]->time_base;
        map[i] = os->index;
    }
    if (oc->nb_streams == 0) { ret = -2; goto done; }

    if (!(oc->oformat->flags & AVFMT_NOFILE)) {
        if ((ret = avio_open(&oc->pb, dst, AVIO_FLAG_WRITE)) < 0) goto done;
        opened_io = true;
    }
    if ((ret = avformat_write_header(oc, nullptr)) < 0) goto done;
    header_written = true;

    // seek the whole file to the keyframe at-or-before start
    if ((ret = av_seek_frame(ic, -1, start_ms * 1000,
                             AVSEEK_FLAG_BACKWARD)) < 0)
        goto done;

    pkt = av_packet_alloc();
    while (av_read_frame(ic, pkt) >= 0) {
        int in_idx = pkt->stream_index;
        if (in_idx >= (int)map.size() || map[in_idx] < 0) {
            av_packet_unref(pkt);
            continue;
        }
        AVStream *is = ic->streams[in_idx];
        AVStream *os = oc->streams[map[in_idx]];
        long long t_ms = pkt->pts == AV_NOPTS_VALUE ? -1
            : av_rescale_q(pkt->pts, is->time_base, AVRational{1, 1000});
        if (t_ms > end_ms) {
            // past the window on this stream; other streams may lag, so keep
            // reading until EVERY mapped stream is past (cheap approximation:
            // stop once the video stream passes — audio packets are tiny)
            if (is->codecpar->codec_type == AVMEDIA_TYPE_VIDEO) {
                av_packet_unref(pkt);
                break;
            }
            av_packet_unref(pkt);
            continue;
        }
        if (origin_ms == AV_NOPTS_VALUE) {
            // anchor on the first VIDEO packet (the snap keyframe); for
            // audio-only files, the first packet of any stream
            if (is->codecpar->codec_type == AVMEDIA_TYPE_VIDEO ||
                !have_video) {
                long long t = pkt->dts != AV_NOPTS_VALUE ? pkt->dts
                    : (pkt->pts != AV_NOPTS_VALUE ? pkt->pts : 0);
                origin_ms = av_rescale_q(t, is->time_base,
                                         AVRational{1, 1000});
            } else {
                // audio arriving before the anchor keyframe: drop it (its
                // video hasn't started; keeping it would front-load silence)
                av_packet_unref(pkt);
                continue;
            }
        }
        // rebase every stream by the SAME origin so A/V sync is preserved
        long long off = av_rescale_q(origin_ms, AVRational{1, 1000},
                                     is->time_base);
        if (pkt->pts != AV_NOPTS_VALUE) pkt->pts -= off;
        if (pkt->dts != AV_NOPTS_VALUE) pkt->dts -= off;
        av_packet_rescale_ts(pkt, is->time_base, os->time_base);
        pkt->stream_index = os->index;
        pkt->pos = -1;
        if ((ret = av_interleaved_write_frame(oc, pkt)) < 0) {
            av_packet_unref(pkt);
            goto done;
        }
        wrote++;
        av_packet_unref(pkt);
    }
    ret = wrote > 0 ? 0 : -3;  // header-only output is a failure, not a clip

done:
    if (header_written) av_write_trailer(oc);
    if (pkt) av_packet_free(&pkt);
    if (oc) {
        if (opened_io) avio_closep(&oc->pb);
        avformat_free_context(oc);
    }
    if (ic) avformat_close_input(&ic);
    return ret < 0 ? ret : 0;
}

}  // extern "C"
