// tspo_decode — native video decoder for the TSPO TPU framework.
//
// Replaces the decord dependency of the reference (C++ FFmpeg wheel,
// SURVEY.md §0 "native performance comes from prebuilt wheels"): sequential
// demux + multi-threaded decode + swscale-to-RGB24, gathering an arbitrary
// sorted set of frame indices in one pass.  The 1-fps sampling pattern touches
// a few percent of frames spread across the whole file, so we seek to the
// nearest keyframe before each wanted index when the gap is large, and stream
// decode across dense runs.
//
// C ABI (ctypes-friendly; see tspo_tpu/video/native.py):
//   tspo_probe(path, &nframes, &fps, &w, &h)            -> 0 on success
//   tspo_gather(path, idx, n, out, out_cap)             -> frames written
//     out: n * h * w * 3 bytes RGB24, frame i at out + i*h*w*3.
//     Missing frames (EOF/corrupt tail) repeat the last decoded frame,
//     mirroring decord's EOF-retry tolerance.

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

#include <algorithm>
#include <atomic>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Per-decoder ffmpeg thread budget.  0 = use all hardware threads (the
// standalone-gather default).  The DecodePool sets cores/workers here so
// concurrent gathers don't multiply to workers x cores frame threads.
std::atomic<int> g_thread_budget{0};

struct Reader {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  SwsContext* sws = nullptr;
  int stream_index = -1;
  int width = 0, height = 0;
  double fps = 0.0;
  int64_t nframes = 0;

  ~Reader() {
    if (sws) sws_freeContext(sws);
    if (codec) avcodec_free_context(&codec);
    if (fmt) avformat_close_input(&fmt);
  }

  bool open(const char* path) {
    if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return false;
    if (avformat_find_stream_info(fmt, nullptr) < 0) return false;
    stream_index =
        av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
    if (stream_index < 0) return false;
    AVStream* st = fmt->streams[stream_index];
    const AVCodec* dec = avcodec_find_decoder(st->codecpar->codec_id);
    if (!dec) return false;
    codec = avcodec_alloc_context3(dec);
    if (!codec || avcodec_parameters_to_context(codec, st->codecpar) < 0)
      return false;
    int budget = g_thread_budget.load(std::memory_order_relaxed);
    codec->thread_count =
        budget > 0 ? budget : std::max(1u, std::thread::hardware_concurrency());
    codec->thread_type = FF_THREAD_FRAME | FF_THREAD_SLICE;
    if (avcodec_open2(codec, dec, nullptr) < 0) return false;

    width = codec->width;
    height = codec->height;
    AVRational r = st->avg_frame_rate.num ? st->avg_frame_rate : st->r_frame_rate;
    fps = r.den ? av_q2d(r) : 0.0;
    nframes = st->nb_frames;
    if (nframes <= 0 && fps > 0 && fmt->duration > 0)
      nframes = (int64_t)(fmt->duration * fps / AV_TIME_BASE);
    return true;
  }
};

}  // namespace

extern "C" {

void tspo_set_decode_threads(int n) {
  g_thread_budget.store(n > 0 ? n : 0, std::memory_order_relaxed);
}

int tspo_probe(const char* path, long long* nframes, double* fps, int* w,
               int* h) {
  Reader r;
  if (!r.open(path)) return -1;
  *nframes = r.nframes;
  *fps = r.fps;
  *w = r.width;
  *h = r.height;
  return 0;
}

long long tspo_gather(const char* path, const long long* indices, long long n,
                      unsigned char* out, long long out_cap) {
  if (n <= 0) return 0;
  Reader r;
  if (!r.open(path)) return -1;
  const int64_t frame_bytes = (int64_t)r.width * r.height * 3;
  if (out_cap < frame_bytes * n) return -2;

  std::vector<int64_t> want(indices, indices + n);
  // Caller passes sorted unique-ish indices; enforce sortedness defensively.
  std::vector<int64_t> sorted = want;
  std::sort(sorted.begin(), sorted.end());

  r.sws = sws_getContext(r.width, r.height, r.codec->pix_fmt, r.width, r.height,
                         AV_PIX_FMT_RGB24, SWS_BILINEAR, nullptr, nullptr,
                         nullptr);
  if (!r.sws) return -3;

  AVStream* st = r.fmt->streams[r.stream_index];
  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  std::vector<unsigned char> rgb(frame_bytes);
  std::vector<unsigned char> last_good;
  // decoded[i] set when sorted[i] written into scratch map; we stream in
  // order, so write directly into a per-sorted-position buffer.
  std::vector<std::vector<unsigned char>> frames_by_pos(sorted.size());

  int64_t decode_pos = 0;    // next display-order frame index
  size_t want_pos = 0;       // next sorted[] entry to satisfy
  int64_t seeked_for = -1;   // wanted index the last seek targeted
  // (MPEG-PS reports index entries yet still lands off-target, so gate on
  // the demuxer name rather than avformat_index_get_entries_count.)
  const char* fmt_name = r.fmt->iformat ? r.fmt->iformat->name : "";
  const bool can_seek =
      strstr(fmt_name, "mp4") || strstr(fmt_name, "mov") ||
      strstr(fmt_name, "matroska") || strstr(fmt_name, "webm") ||
      strstr(fmt_name, "avi");
  // Streams whose timestamps don't start at zero (MPEG-TS/PS): frame index
  // after a seek = (pts - anchor) * fps, and seek targets get the anchor
  // added back.  st->start_time is not reliable for MPEG-PS (measured 3
  // frames before the first video pts), so when it is nonzero, probe the
  // first video packet's own pts through a second demuxer open — the main
  // context must not be disturbed (rewind via av_seek_frame is itself
  // imprecise on these containers).
  int64_t start_ts =
      (st->start_time != AV_NOPTS_VALUE && st->start_time > 0)
          ? st->start_time : 0;
  if (start_ts > 0) {
    AVFormatContext* probe = nullptr;
    if (avformat_open_input(&probe, path, nullptr, nullptr) >= 0) {
      AVPacket* ppkt = av_packet_alloc();
      while (av_read_frame(probe, ppkt) >= 0) {
        if (ppkt->stream_index == r.stream_index) {
          int64_t t = ppkt->pts != AV_NOPTS_VALUE ? ppkt->pts : ppkt->dts;
          if (t != AV_NOPTS_VALUE) start_ts = t;
          av_packet_unref(ppkt);
          break;
        }
        av_packet_unref(ppkt);
      }
      av_packet_free(&ppkt);
      avformat_close_input(&probe);
    }
  }

  auto store = [&](AVFrame* f, size_t pos_in_sorted) {
    uint8_t* dst[1] = {rgb.data()};
    int dst_stride[1] = {r.width * 3};
    sws_scale(r.sws, f->data, f->linesize, 0, r.height, dst, dst_stride);
    frames_by_pos[pos_in_sorted].assign(rgb.begin(), rgb.end());
    last_good = frames_by_pos[pos_in_sorted];
  };

  bool eof = false;
  while (want_pos < sorted.size() && !eof) {
    // Large gap to the next wanted frame: seek to its keyframe.  150 frames
    // (~5s at 30fps) is past the typical GOP, where streaming loses to a seek.
    // Seek AT MOST ONCE per wanted index, and never while decode_pos is still
    // unknown from a previous seek: a backward seek always lands at the same
    // keyframe, so re-firing it (audio packet interleave, GOPs longer than
    // the 150-frame gap) would loop forever without progressing.  Seeks are
    // only frame-exact in index-backed containers (mp4/mkv); index-less ones
    // (MPEG-TS/PS) byte-interpolate and drop frames around the landing point
    // (measured ±3-7 on MPEG-PS), so those stream-decode instead.
    if (can_seek && decode_pos >= 0 && sorted[want_pos] > decode_pos + 150 &&
        sorted[want_pos] != seeked_for) {
      // Aim 1s early: index-less containers (MPEG-TS) seek by byte-position
      // interpolation and can land PAST the target even with
      // AVSEEK_FLAG_BACKWARD; the margin costs ~one GOP of extra decode.
      double target_sec =
          sorted[want_pos] / (r.fps > 0 ? r.fps : 30.0) - 1.0;
      if (target_sec < 0) target_sec = 0;
      int64_t ts = av_rescale_q((int64_t)(target_sec * AV_TIME_BASE),
                                AVRational{1, AV_TIME_BASE}, st->time_base) +
                   start_ts;
      if (av_seek_frame(r.fmt, r.stream_index, ts, AVSEEK_FLAG_BACKWARD) >= 0) {
        avcodec_flush_buffers(r.codec);
        decode_pos = -1;  // unknown until first pts
        seeked_for = sorted[want_pos];
      }
    }

    int ret = av_read_frame(r.fmt, pkt);
    if (ret < 0) {
      // Enter drain mode.  send_packet(nullptr) returns EAGAIN while the
      // decoder still holds undelivered output (frame-threading buffers
      // ~thread_count frames): receive below, then retry next iteration —
      // setting eof before drain mode is entered silently drops the tail.
      int s = avcodec_send_packet(r.codec, nullptr);
      if (s != AVERROR(EAGAIN)) eof = true;
    } else if (pkt->stream_index != r.stream_index) {
      av_packet_unref(pkt);
      continue;
    } else {
      avcodec_send_packet(r.codec, pkt);
      av_packet_unref(pkt);
    }

    while (avcodec_receive_frame(r.codec, frame) >= 0) {
      if (decode_pos < 0) {
        // Recover display index from pts after a seek (start_time-relative).
        int64_t pts = frame->best_effort_timestamp;
        if (pts == AV_NOPTS_VALUE) pts = start_ts;
        double sec = (pts - start_ts) * av_q2d(st->time_base);
        decode_pos = (int64_t)(sec * (r.fps > 0 ? r.fps : 30.0) + 0.5);
        if (decode_pos < 0) decode_pos = 0;
      }
      while (want_pos < sorted.size() && sorted[want_pos] <= decode_pos) {
        store(frame, want_pos);
        ++want_pos;
      }
      ++decode_pos;
      av_frame_unref(frame);
      if (want_pos >= sorted.size()) break;
    }
  }

  av_packet_free(&pkt);
  av_frame_free(&frame);

  if (last_good.empty()) return -4;
  // Fill any unsatisfied tail with the last decoded frame.
  for (size_t i = 0; i < sorted.size(); ++i)
    if (frames_by_pos[i].empty()) frames_by_pos[i] = last_good;

  // Emit in the caller's original order (indices may repeat).
  for (int64_t i = 0; i < n; ++i) {
    size_t pos = std::lower_bound(sorted.begin(), sorted.end(), want[i]) -
                 sorted.begin();
    std::memcpy(out + i * frame_bytes, frames_by_pos[pos].data(), frame_bytes);
  }
  return n;
}

}  // extern "C"
