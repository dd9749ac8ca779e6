// vjepa2_tpu native video decoder: libavformat/libavcodec/libswscale.
//
// Plays the role decord's C++ decoder plays in the reference
// (`/root/reference/src/datasets/video_dataset.py:16`): random-access
// RGB frame batches at native decode speed. The cv2 backend this replaces
// seeks per frame through VideoCapture (re-entering the keyframe decode
// path for every strided index) and converts EVERY read frame to RGB;
// this decoder seeks at most once per batch to the keyframe before the
// first wanted index, decodes forward with frame-threaded libavcodec, and
// converts ONLY the wanted frames.
//
// Build: native/build.sh  ->  vjepa2_tpu/data/_native/libvideo_decode.so
// API (ctypes, see vjepa2_tpu/data/native.py):
//   vd_open(path, nthreads) -> ctx*        (NULL on failure; vd_last_error())
//   vd_num_frames / vd_fps / vd_width / vd_height(ctx)
//   vd_get_batch(ctx, indices, n, out)  -> 0 ok / <0 error
//   vd_close(ctx)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswscale/swscale.h>
}

namespace {

thread_local std::string g_last_error;

void set_error(const std::string& msg) { g_last_error = msg; }

struct VDContext {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  SwsContext* sws = nullptr;
  AVPacket* pkt = nullptr;
  AVFrame* frame = nullptr;
  int stream_index = -1;
  int width = 0;
  int height = 0;
  double fps = 30.0;
  int64_t num_frames = 0;
  // decode cursor: index of the NEXT frame the decoder will emit when
  // reading sequentially without a seek; <0 = unknown (right after a seek,
  // until the first pts is observed)
  int64_t next_index = 0;
  int64_t start_pts = 0;  // first frame's pts (stream time_base)
  bool start_pts_known = false;
  bool at_start = true;     // decoder positioned at stream start (no seek yet)
  bool pkt_pending = false; // pkt holds a packet the codec EAGAIN'd on
  bool draining = false;    // codec got the EOF flush packet; must seek (or
                            // flush) before it will accept input again
  // geometry the current sws context was built for (frames can change
  // resolution/pix_fmt mid-stream; codecpar can lie about both)
  int sws_w = 0;
  int sws_h = 0;
  AVPixelFormat sws_fmt = AV_PIX_FMT_NONE;

  ~VDContext() {
    if (sws) sws_freeContext(sws);
    if (codec) avcodec_free_context(&codec);
    if (fmt) avformat_close_input(&fmt);
    if (pkt) av_packet_free(&pkt);
    if (frame) av_frame_free(&frame);
  }
};

// Seeking farther ahead than this many frames re-seeks instead of decoding
// through the gap (H.264 GOPs in web/dataset video are typically 12-250).
constexpr int64_t kSeekGapFrames = 256;

double stream_fps(AVStream* st) {
  AVRational r = st->avg_frame_rate;
  if (r.num <= 0 || r.den <= 0) r = st->r_frame_rate;
  if (r.num <= 0 || r.den <= 0) return 30.0;
  return av_q2d(r);
}

// frame index of a decoded frame from its pts (CFR assumption — the same
// one cv2/decord random access makes)
int64_t pts_to_index(const VDContext* c, int64_t pts) {
  AVStream* st = c->fmt->streams[c->stream_index];
  double sec = (pts - c->start_pts) * av_q2d(st->time_base);
  return llround(sec * c->fps);
}

int64_t index_to_ts(const VDContext* c, int64_t index) {
  AVStream* st = c->fmt->streams[c->stream_index];
  double sec = index / c->fps;
  return c->start_pts + (int64_t)llround(sec / av_q2d(st->time_base));
}

// Decode forward; returns 1 with *out_index set when a frame is produced,
// 0 on EOF, <0 on error.
int next_frame(VDContext* c, int64_t* out_index) {
  for (;;) {
    int ret = avcodec_receive_frame(c->codec, c->frame);
    if (ret == 0) {
      int64_t pts = c->frame->best_effort_timestamp;
      if (pts == AV_NOPTS_VALUE) pts = c->frame->pts;
      if (!c->start_pts_known && pts != AV_NOPTS_VALUE && c->at_start) {
        // first frame decoded from the TRUE stream start defines the origin
        // (a frame decoded after a mid-file seek lands on a keyframe and
        // must not — it would shift every pts->index mapping)
        c->start_pts = pts;
        c->start_pts_known = true;
      }
      c->at_start = false;
      int64_t idx;
      if (pts != AV_NOPTS_VALUE && c->start_pts_known)
        idx = pts_to_index(c, pts);
      else
        idx = c->next_index >= 0 ? c->next_index : 0;
      c->next_index = idx + 1;
      *out_index = idx;
      return 1;
    }
    if (ret == AVERROR_EOF) return 0;
    if (ret != AVERROR(EAGAIN)) {
      set_error("avcodec_receive_frame failed");
      return -1;
    }
    // feed more input
    for (;;) {
      if (c->pkt_pending) {
        // a packet the codec EAGAIN'd on earlier: resend it before reading
        // more (dropping it would lose the frames it carries)
        ret = avcodec_send_packet(c->codec, c->pkt);
        if (ret == AVERROR(EAGAIN)) break;  // drain frames, resend later
        c->pkt_pending = false;
        av_packet_unref(c->pkt);
        if (ret == 0) break;
        continue;  // corrupt packet: skip it rather than fail the batch
      }
      ret = av_read_frame(c->fmt, c->pkt);
      if (ret < 0) {
        avcodec_send_packet(c->codec, nullptr);  // flush
        c->draining = true;
        break;
      }
      if (c->pkt->stream_index != c->stream_index) {
        av_packet_unref(c->pkt);
        continue;
      }
      ret = avcodec_send_packet(c->codec, c->pkt);
      if (ret == AVERROR(EAGAIN)) {
        c->pkt_pending = true;  // decoder full: drain, then resend this one
        break;
      }
      av_packet_unref(c->pkt);
      if (ret == 0) break;
      // corrupt packet: skip it rather than fail the batch
    }
  }
}

int seek_to(VDContext* c, int64_t index) {
  int64_t ts = index_to_ts(c, index);
  int ret = av_seek_frame(c->fmt, c->stream_index, ts, AVSEEK_FLAG_BACKWARD);
  if (ret < 0) {
    // fall back to rewinding the whole stream
    ret = av_seek_frame(c->fmt, c->stream_index, 0,
                        AVSEEK_FLAG_BACKWARD | AVSEEK_FLAG_BYTE);
    if (ret < 0) ret = av_seek_frame(c->fmt, c->stream_index, 0, AVSEEK_FLAG_BACKWARD);
    if (ret < 0) {
      set_error("av_seek_frame failed");
      return -1;
    }
  }
  avcodec_flush_buffers(c->codec);  // also exits draining mode
  if (c->pkt_pending) {
    av_packet_unref(c->pkt);
    c->pkt_pending = false;
  }
  c->draining = false;
  c->next_index = -1;   // unknown until the first decoded pts
  c->at_start = false;  // positioned at a keyframe, not the stream origin
  return 0;
}

// Convert the current frame to RGB24 at the container-reported (fixed)
// output size. The sws context is (re)built from the frame's ACTUAL
// geometry — codecpar can over-report height (cropped H.264) and streams
// can change resolution/pix_fmt mid-file; scaling from the real frame
// keeps the batch buffer layout fixed without reading out of bounds.
int convert_rgb(VDContext* c, uint8_t* dst) {
  const int fw = c->frame->width, fh = c->frame->height;
  const AVPixelFormat ffmt = (AVPixelFormat)c->frame->format;
  if (fw <= 0 || fh <= 0 || ffmt == AV_PIX_FMT_NONE) {
    set_error("decoded frame reports no geometry");
    return -1;
  }
  if (!c->sws || fw != c->sws_w || fh != c->sws_h || ffmt != c->sws_fmt) {
    if (c->sws) sws_freeContext(c->sws);
    c->sws = sws_getContext(fw, fh, ffmt, c->width, c->height,
                            AV_PIX_FMT_RGB24, SWS_BILINEAR, nullptr, nullptr,
                            nullptr);
    if (!c->sws) {
      set_error("sws_getContext failed");
      return -1;
    }
    c->sws_w = fw;
    c->sws_h = fh;
    c->sws_fmt = ffmt;
  }
  uint8_t* planes[4] = {dst, nullptr, nullptr, nullptr};
  int strides[4] = {3 * c->width, 0, 0, 0};
  sws_scale(c->sws, c->frame->data, c->frame->linesize, 0, fh, planes,
            strides);
  return 0;
}

}  // namespace

extern "C" {

const char* vd_last_error() { return g_last_error.c_str(); }

VDContext* vd_open(const char* path, int nthreads) {
  auto c = new VDContext();
  if (avformat_open_input(&c->fmt, path, nullptr, nullptr) < 0) {
    set_error(std::string("avformat_open_input failed: ") + path);
    delete c;
    return nullptr;
  }
  if (avformat_find_stream_info(c->fmt, nullptr) < 0) {
    set_error("avformat_find_stream_info failed");
    delete c;
    return nullptr;
  }
  const AVCodec* dec = nullptr;
  c->stream_index =
      av_find_best_stream(c->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &dec, 0);
  if (c->stream_index < 0 || !dec) {
    set_error("no video stream");
    delete c;
    return nullptr;
  }
  AVStream* st = c->fmt->streams[c->stream_index];
  c->codec = avcodec_alloc_context3(dec);
  if (!c->codec || avcodec_parameters_to_context(c->codec, st->codecpar) < 0) {
    set_error("codec context setup failed");
    delete c;
    return nullptr;
  }
  c->codec->thread_count = nthreads;  // 0 = auto
  c->codec->thread_type = FF_THREAD_FRAME | FF_THREAD_SLICE;
  if (avcodec_open2(c->codec, dec, nullptr) < 0) {
    set_error("avcodec_open2 failed");
    delete c;
    return nullptr;
  }
  c->width = c->codec->width;
  c->height = c->codec->height;
  c->fps = stream_fps(st);
  if (st->start_time != AV_NOPTS_VALUE) {
    c->start_pts = st->start_time;
    c->start_pts_known = true;
  }
  c->num_frames = st->nb_frames;
  if (c->num_frames <= 0) {
    int64_t dur = st->duration;
    double sec = dur != AV_NOPTS_VALUE && dur > 0
                     ? dur * av_q2d(st->time_base)
                     : (c->fmt->duration != AV_NOPTS_VALUE
                            ? c->fmt->duration / (double)AV_TIME_BASE
                            : 0.0);
    c->num_frames = (int64_t)llround(sec * c->fps);
  }
  if (c->width <= 0 || c->height <= 0) {
    set_error("stream reports no frame size");
    delete c;
    return nullptr;
  }
  c->pkt = av_packet_alloc();
  c->frame = av_frame_alloc();
  // sws is created lazily in convert_rgb from the first decoded frame's
  // actual geometry (codecpar's pix_fmt/height can be wrong or unknown)
  return c;
}

void vd_close(VDContext* c) { delete c; }

int64_t vd_num_frames(VDContext* c) { return c->num_frames; }
double vd_fps(VDContext* c) { return c->fps; }
int vd_width(VDContext* c) { return c->width; }
int vd_height(VDContext* c) { return c->height; }

// Decode frames at `indices` (any order, duplicates fine) into `out`
// (n * height * width * 3 uint8, RGB, in the order of `indices`).
// Indices past the last decodable frame clamp to the last decoded one
// (matching the cv2 backend's behavior on truncated files).
int vd_get_batch(VDContext* c, const int64_t* indices, int n, uint8_t* out) {
  if (n <= 0) return 0;
  std::vector<int64_t> sorted(indices, indices + n);
  std::sort(sorted.begin(), sorted.end());
  sorted.erase(std::unique(sorted.begin(), sorted.end()), sorted.end());
  for (int64_t idx : sorted)
    if (idx < 0) {
      set_error("negative frame index");
      return -1;
    }

  const size_t frame_bytes = (size_t)c->height * c->width * 3;
  // where each unique index lands in `out` (first occurrence); duplicates
  // are copied afterwards
  std::vector<uint8_t*> slot(sorted.size(), nullptr);
  for (size_t u = 0; u < sorted.size(); ++u)
    for (int j = 0; j < n; ++j)
      if (indices[j] == sorted[u]) {
        slot[u] = out + (size_t)j * frame_bytes;
        break;
      }

  size_t u = 0;  // next unique index to satisfy
  uint8_t* last_done = nullptr;
  // If the pts origin is unknown (container without start_time) and the
  // first access wants to seek, learn the origin first: rewind to the true
  // start and decode one frame. Seeking blind would make index_to_ts guess
  // an origin AND adopt the landing keyframe's pts as frame 0, shifting
  // every subsequent pts->index mapping.
  if (!c->start_pts_known && sorted[0] > kSeekGapFrames && c->at_start) {
    int64_t idx_probe;
    int pr = next_frame(c, &idx_probe);
    if (pr < 0) return -3;
    if (pr > 0 && idx_probe >= sorted[0]) {
      // degenerate: the probe already reached the request (tiny stream)
      c->next_index = idx_probe;  // fall through; loop below handles it
    }
  }
  // Timestamp seeks are only meaningful once the pts origin is known; on a
  // pts-less stream the only safe repositioning is a full rewind (counting
  // restarts from the true start) — a ts-seek would land on a keyframe
  // whose index cannot be recovered, shifting the whole mapping. A far
  // FORWARD gap on such a stream therefore decodes through instead.
  const bool can_ts_seek = c->start_pts_known;
  // Index already ts-sought in THIS batch: never seek to the same target
  // twice. A target past the last decodable frame otherwise ping-pongs
  // forever — seek lands on the final keyframe, decode hits EOF without
  // reaching the target, and the far-gap check re-issues the same seek.
  int64_t sought = -1;
  // position the decoder: when behind, draining past EOF, fresh off a
  // seek, or far ahead (seekable streams only)
  if (c->draining || c->next_index < 0 || sorted[0] < c->next_index ||
      (can_ts_seek && sorted[0] > c->next_index + kSeekGapFrames)) {
    if (can_ts_seek && sorted[0] != 0) sought = sorted[0];
    if (!can_ts_seek || sorted[0] == 0 || seek_to(c, sorted[0]) < 0) {
      // want frame 0 (cheap rewind), pts-less stream, or ts-seek failed
      if (av_seek_frame(c->fmt, c->stream_index, 0, AVSEEK_FLAG_BACKWARD) < 0) {
        // some demuxers can't seek at all (raw streams): reopen from scratch
        set_error("rewind failed");
        return -2;
      }
      avcodec_flush_buffers(c->codec);  // also exits draining mode
      if (c->pkt_pending) {
        av_packet_unref(c->pkt);
        c->pkt_pending = false;
      }
      c->draining = false;
      c->next_index = -1;
      c->at_start = true;  // rewound to the true stream start
    }
  }

  int64_t last_seen_idx = -1;  // newest decoded index (consumed or not)
  while (u < sorted.size()) {
    int64_t idx;
    int ret = next_frame(c, &idx);
    if (ret < 0) return -3;
    if (ret == 0) break;  // EOF: clamp below
    last_seen_idx = idx;
    // after a seek the decoder may emit frames BEFORE the target
    while (u < sorted.size() && sorted[u] < idx) {
      // wanted frame skipped (pts jumped over it): serve this frame instead
      if (convert_rgb(c, slot[u]) < 0) return -4;
      last_done = slot[u];
      ++u;
    }
    if (u < sorted.size() && sorted[u] == idx) {
      if (convert_rgb(c, slot[u]) < 0) return -4;
      last_done = slot[u];
      ++u;
    }
    // large mid-batch gap: jump instead of decoding through it (ts-seeks
    // need a known pts origin; pts-less streams decode through; a target
    // already sought this batch decodes through — see `sought` above)
    if (u < sorted.size() && c->start_pts_known && sorted[u] != sought &&
        sorted[u] > c->next_index + kSeekGapFrames) {
      if (seek_to(c, sorted[u]) < 0) return -5;
      sought = sorted[u];
    }
  }
  if (u < sorted.size() && !last_done && last_seen_idx >= 0) {
    // EVERY wanted index lies past EOF (metadata over-reported num_frames)
    // and the decoded frames all went unconsumed: re-decode the tail and
    // keep the last decodable frame, so the clamp below has something to
    // clamp to (cv2-backend behavior on truncated files).
    bool repositioned = false;
    if (c->start_pts_known && seek_to(c, last_seen_idx) == 0) {
      repositioned = true;
    } else if (av_seek_frame(c->fmt, c->stream_index, 0,
                             AVSEEK_FLAG_BACKWARD) >= 0) {
      avcodec_flush_buffers(c->codec);
      if (c->pkt_pending) {
        av_packet_unref(c->pkt);
        c->pkt_pending = false;
      }
      c->draining = false;
      c->next_index = -1;
      c->at_start = true;
      repositioned = true;
    }
    if (repositioned) {
      int64_t idx2;
      int r2;
      while ((r2 = next_frame(c, &idx2)) > 0) {
        if (convert_rgb(c, slot[u]) < 0) return -4;
        last_done = slot[u];
      }
      if (r2 < 0) return -3;
      if (last_done) ++u;
    }
  }
  if (u < sorted.size()) {
    // EOF before all wanted frames: clamp to the last decoded frame
    if (!last_done) {
      set_error("no frames decoded");
      return -6;
    }
    for (; u < sorted.size(); ++u) {
      std::memcpy(slot[u], last_done, frame_bytes);
      last_done = slot[u];
    }
  }
  // fill duplicate positions
  for (size_t k = 0; k < sorted.size(); ++k)
    for (int j = 0; j < n; ++j) {
      uint8_t* dst = out + (size_t)j * frame_bytes;
      if (indices[j] == sorted[k] && dst != slot[k])
        std::memcpy(dst, slot[k], frame_bytes);
    }
  return 0;
}

}  // extern "C"
