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
#include <cstring>
#include <thread>
#include <vector>

namespace {

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
    codec->thread_count = std::max(1u, std::thread::hardware_concurrency());
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

  int64_t decode_pos = 0;  // next display-order frame index
  size_t want_pos = 0;     // next sorted[] entry to satisfy

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
    if (sorted[want_pos] > decode_pos + 150) {
      int64_t ts = av_rescale_q(
          (int64_t)(sorted[want_pos] / (r.fps > 0 ? r.fps : 30.0) * AV_TIME_BASE),
          AVRational{1, AV_TIME_BASE}, st->time_base);
      if (av_seek_frame(r.fmt, r.stream_index, ts, AVSEEK_FLAG_BACKWARD) >= 0) {
        avcodec_flush_buffers(r.codec);
        decode_pos = -1;  // unknown until first pts
      }
    }

    int ret = av_read_frame(r.fmt, pkt);
    if (ret < 0) {
      avcodec_send_packet(r.codec, nullptr);  // flush
      eof = true;
    } else if (pkt->stream_index != r.stream_index) {
      av_packet_unref(pkt);
      continue;
    } else {
      avcodec_send_packet(r.codec, pkt);
      av_packet_unref(pkt);
    }

    while (avcodec_receive_frame(r.codec, frame) >= 0) {
      if (decode_pos < 0) {
        // Recover display index from pts after a seek.
        int64_t pts = frame->best_effort_timestamp;
        double sec = pts * av_q2d(st->time_base);
        decode_pos = (int64_t)(sec * (r.fps > 0 ? r.fps : 30.0) + 0.5);
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
