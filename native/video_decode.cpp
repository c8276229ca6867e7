// First-party sampled video decoder over the system FFmpeg libraries.
//
// The role: feed eioku_tpu/ml/video_io.py's fixed-shape frame batches faster
// than cv2 can on a small host. Wins over the cv2 path (which fronts the same
// libav code):
//   - DCT-domain `lowres` decode: codecs that support it (mpeg4 = max_lowres
//     3) decode directly at 1/2^L resolution — the biggest lever when the
//     model input is small (scene scoring runs at 96x160 from 720p+ sources)
//     and the host has few cores. cv2 never exposes this.
//   - fused scale+colorspace: one sws_scale call converts YUV -> RGB at the
//     target geometry, only for sampled frames; cv2's read() always converts
//     full-resolution BGR first.
// Replaces the reference's per-frame cv2 loop decode strategy
// (/root/reference/ml-service/src/services/model_manager.py:236-299) on the
// serial path; the cv2 stripe pool remains for many-core hosts.
//
// C ABI:
//   eioku_video_open(path, target_w, target_h, max_lowres, &h,
//                    &src_w, &src_h, &out_w, &out_h, &fps, &n_frames) -> 0 ok
//       target 0x0 keeps the decoded geometry (lowres still applies).
//       max_lowres caps the DCT-domain downscale; the codec's own max and the
//       target size (stay >= ~1.2x target) bound it further.
//   eioku_video_read(h, step, max_frames, end_frame, rgb_out, indices_out,
//                    &n) -> 0 ok / 1 EOF-or-end reached (n may still be > 0).
//       Samples source frames whose index is a multiple of `step`, converts
//       to RGB24 at out_w x out_h into rgb_out (max_frames*out_h*out_w*3
//       bytes), writes source frame indices. end_frame < 0 = to EOF;
//       otherwise stops before that presentation index (stripe segments).
//   eioku_video_seek(h, frame_index) -> 0 ok. Seeks to the keyframe at or
//       before frame_index, then decodes forward discarding frames until the
//       next emitted frame is frame_index (exact, stripe-aligned).
//   eioku_video_close(h)
//
// Build: g++ -O2 -shared -fPIC -std=c++17 video_decode.cpp
//        -lavformat -lavcodec -lswscale -lavutil

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

#include <cstring>

namespace {

struct Video {
    AVFormatContext *fmt = nullptr;
    AVCodecContext *dec = nullptr;
    SwsContext *sws = nullptr;
    AVPacket *pkt = nullptr;
    AVFrame *frame = nullptr;
    int stream = -1;
    int out_w = 0, out_h = 0;
    double fps = 30.0;
    double idx_fps = 30.0;      // rate used for pts<->index mapping: prefers
                                // r_frame_rate (exact for CFR streams) over
                                // avg_frame_rate, whose duration-derived
                                // value is biased by ~1/n_frames and drifts
                                // the recovered index by +1 near EOF
    double tb = 0.0;            // stream time_base as double (pts indexing)
    long long start_pts = 0;    // stream start_time (0 if unset)
    long long next_index = 0;  // presentation index of the next decoded frame
    long long next_target = -1;  // next sample index to emit (-1 = derive)
    bool pts_index = false;  // index frames by pts, not by arrival count
                             // (required when skip_frame drops non-refs)
    bool draining = false;
    bool done = false;
    bool pending = false;  // v->frame holds an undelivered post-seek frame
};

void video_free(Video *v) {
    if (!v) return;
    if (v->sws) sws_freeContext(v->sws);
    if (v->dec) avcodec_free_context(&v->dec);
    if (v->fmt) avformat_close_input(&v->fmt);
    if (v->pkt) av_packet_free(&v->pkt);
    if (v->frame) av_frame_free(&v->frame);
    delete v;
}

}  // namespace

extern "C" {

void eioku_video_close(void *h) { video_free((Video *)h); }

// flags (analysis-decode accelerators, both lossy-but-harmless for model
// input sampling; keep 0 for bit-exact cv2 parity):
//   1 = skip the in-loop deblocking filter (AVDISCARD_ALL): ~15-30% less
//       decode CPU; output drifts a few LSBs vs reference decode — invisible
//       to detection/scene scoring at model resolutions.
//   2 = skip non-reference frames (AVDISCARD_NONREF) and index frames by
//       PTS: sampled output snaps to the nearest decodable (reference)
//       frame, at most a couple of frames late. Correct only when the
//       sample step is larger than the B-frame run length; callers enable
//       it for sparse sampling (step >= 4), where skipping the non-ref
//       frames between samples saves their whole motion-comp cost.
int eioku_video_open(const char *path, int target_w, int target_h,
                     int max_lowres, int flags, void **handle, int *src_w,
                     int *src_h, int *out_w, int *out_h, double *fps,
                     long long *n_frames) {
    *handle = nullptr;
    Video *v = new Video();
    int ret = avformat_open_input(&v->fmt, path, nullptr, nullptr);
    if (ret < 0) { video_free(v); return ret; }
    if ((ret = avformat_find_stream_info(v->fmt, nullptr)) < 0) {
        video_free(v);
        return ret;
    }
    const AVCodec *codec = nullptr;
    v->stream = av_find_best_stream(v->fmt, AVMEDIA_TYPE_VIDEO, -1, -1,
                                    &codec, 0);
    if (v->stream < 0 || !codec) { video_free(v); return AVERROR_STREAM_NOT_FOUND; }
    AVStream *st = v->fmt->streams[v->stream];

    v->dec = avcodec_alloc_context3(codec);
    if (!v->dec) { video_free(v); return AVERROR(ENOMEM); }
    if ((ret = avcodec_parameters_to_context(v->dec, st->codecpar)) < 0) {
        video_free(v);
        return ret;
    }
    *src_w = v->dec->width;
    *src_h = v->dec->height;

    // pick the deepest DCT-domain downscale that keeps >= ~1.2x the target
    int lowres = 0;
    if (max_lowres > 0 && codec->max_lowres > 0 && target_w > 0 &&
        target_h > 0) {
        int cap = max_lowres < codec->max_lowres ? max_lowres
                                                 : codec->max_lowres;
        while (lowres < cap &&
               (v->dec->width >> (lowres + 1)) * 5 >= target_w * 6 &&
               (v->dec->height >> (lowres + 1)) * 5 >= target_h * 6)
            lowres++;
    }
    v->dec->lowres = lowres;
    if (flags & 1) v->dec->skip_loop_filter = AVDISCARD_ALL;
    if (flags & 2) {
        v->dec->skip_frame = AVDISCARD_NONREF;
        v->pts_index = true;  // arrival counting breaks once frames drop
    }
    if ((ret = avcodec_open2(v->dec, codec, nullptr)) < 0) {
        video_free(v);
        return ret;
    }

    int dec_w = AV_CEIL_RSHIFT(*src_w, lowres);
    int dec_h = AV_CEIL_RSHIFT(*src_h, lowres);
    v->out_w = target_w > 0 ? target_w : dec_w;
    v->out_h = target_h > 0 ? target_h : dec_h;
    *out_w = v->out_w;
    *out_h = v->out_h;

    double r = st->avg_frame_rate.den
                   ? (double)st->avg_frame_rate.num / st->avg_frame_rate.den
                   : 0.0;
    if (r <= 0 && st->r_frame_rate.den)
        r = (double)st->r_frame_rate.num / st->r_frame_rate.den;
    *fps = r > 0 ? r : 30.0;
    v->fps = *fps;
    double rr = st->r_frame_rate.den
                    ? (double)st->r_frame_rate.num / st->r_frame_rate.den
                    : 0.0;
    v->idx_fps = (rr > 0 && rr < *fps * 1.05 && rr > *fps * 0.95)
                     ? rr : *fps;  // CFR: exact rational; else avg
    v->tb = av_q2d(st->time_base);
    v->start_pts = st->start_time != AV_NOPTS_VALUE ? st->start_time : 0;
    long long nf = st->nb_frames;
    if (nf <= 0 && v->fmt->duration > 0)
        nf = (long long)(*fps * v->fmt->duration / AV_TIME_BASE + 0.5);
    *n_frames = nf;

    v->pkt = av_packet_alloc();
    v->frame = av_frame_alloc();
    if (!v->pkt || !v->frame) { video_free(v); return AVERROR(ENOMEM); }
    *handle = v;
    return 0;
}

int eioku_video_read(void *h, int step, int max_frames, long long end_frame,
                     unsigned char *rgb_out, long long *indices_out,
                     int *n_out) {
    Video *v = (Video *)h;
    *n_out = 0;
    if (step < 1) step = 1;
    const size_t frame_bytes = (size_t)v->out_w * v->out_h * 3;
    int ret = 0;
    while (*n_out < max_frames && !v->done) {
        if (end_frame >= 0 && v->next_index >= end_frame) return 1;
        // pull every decoded frame; convert only the sampled ones
        if (v->pending) {
            v->pending = false;
            ret = 0;
        } else {
            ret = avcodec_receive_frame(v->dec, v->frame);
        }
        if (ret == AVERROR(EAGAIN)) {
            if (v->draining) { v->done = true; break; }
            ret = av_read_frame(v->fmt, v->pkt);
            if (ret < 0) {
                // EOF or truncated/corrupt tail: flush, keep decoded frames
                v->draining = true;
                avcodec_send_packet(v->dec, nullptr);
                continue;
            }
            if (v->pkt->stream_index != v->stream) {
                av_packet_unref(v->pkt);
                continue;
            }
            ret = avcodec_send_packet(v->dec, v->pkt);
            av_packet_unref(v->pkt);
            // a corrupt packet is skipped, not fatal (cv2-path behavior)
            continue;
        }
        if (ret == AVERROR_EOF) { v->done = true; break; }
        if (ret < 0) return ret;

        long long idx;
        if (v->pts_index) {
            // frames can be missing (skip_frame): recover the presentation
            // index from the timestamp instead of counting arrivals
            int64_t pts = v->frame->best_effort_timestamp;
            idx = pts != AV_NOPTS_VALUE
                      ? (long long)((pts - v->start_pts) * v->tb * v->idx_fps
                                    + 0.5)
                      : v->next_index;
        } else {
            idx = v->next_index;
        }
        v->next_index = idx + 1;
        if (v->next_target < 0)  // align to the global step grid (stripes)
            v->next_target = (idx + step - 1) / step * step;
        if (idx >= v->next_target) {
            v->next_target = idx / step * step + step;
            if (!v->sws) {
                v->sws = sws_getContext(
                    v->frame->width, v->frame->height,
                    (AVPixelFormat)v->frame->format, v->out_w, v->out_h,
                    AV_PIX_FMT_RGB24,
                    v->frame->width >= v->out_w ? SWS_AREA : SWS_BILINEAR,
                    nullptr, nullptr, nullptr);
                if (!v->sws) return AVERROR(ENOMEM);
            }
            uint8_t *dst[1] = {rgb_out + (size_t)(*n_out) * frame_bytes};
            const int dst_stride[1] = {v->out_w * 3};
            sws_scale(v->sws, v->frame->data, v->frame->linesize, 0,
                      v->frame->height, dst, dst_stride);
            indices_out[*n_out] = idx;
            (*n_out)++;
        }
        av_frame_unref(v->frame);
    }
    return v->done ? 1 : 0;
}

int eioku_video_seek(void *h, long long frame_index) {
    Video *v = (Video *)h;
    AVStream *st = v->fmt->streams[v->stream];
    double tb = av_q2d(st->time_base);
    int64_t start = st->start_time != AV_NOPTS_VALUE ? st->start_time : 0;
    int64_t ts = start + (int64_t)(frame_index / v->fps / tb + 0.5);
    int ret = av_seek_frame(v->fmt, v->stream, ts, AVSEEK_FLAG_BACKWARD);
    if (ret < 0) return ret;
    avcodec_flush_buffers(v->dec);
    v->draining = false;
    v->done = false;
    v->next_target = -1;  // re-derive the sample grid after the jump
    v->next_index = -1;  // unknown until the first post-seek frame arrives
    // decode forward, discarding everything before frame_index; the first
    // decoded frame's timestamp recovers the presentation index
    while (true) {
        ret = avcodec_receive_frame(v->dec, v->frame);
        if (ret == AVERROR(EAGAIN)) {
            if (v->draining) { v->done = true; return 0; }
            ret = av_read_frame(v->fmt, v->pkt);
            if (ret < 0) {
                v->draining = true;
                avcodec_send_packet(v->dec, nullptr);
                continue;
            }
            if (v->pkt->stream_index != v->stream) {
                av_packet_unref(v->pkt);
                continue;
            }
            avcodec_send_packet(v->dec, v->pkt);  // corrupt packets skipped
            av_packet_unref(v->pkt);
            continue;
        }
        if (ret == AVERROR_EOF) { v->done = true; return 0; }
        if (ret < 0) return ret;
        if (v->next_index < 0) {
            int64_t pts = v->frame->best_effort_timestamp;
            if (pts == AV_NOPTS_VALUE) pts = start;
            v->next_index =
                (long long)((pts - start) * tb * v->idx_fps + 0.5);
        }
        if (v->next_index >= frame_index) break;
        v->next_index++;
        av_frame_unref(v->frame);
    }
    // the loop exits holding the first in-range frame in v->frame; read()
    // consumes it before pulling the decoder again
    v->pending = true;
    return 0;
}

}  // extern "C"
