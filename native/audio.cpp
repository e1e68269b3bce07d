// tspo_decode audio path — demux + decode + resample an audio stream to
// mono float32 at a target rate (16 kHz for the Whisper-geometry tower,
// models/audio.py).  The video benchmarks' audio tracks (WorldSense /
// AV-Odyssey) live inside the same containers the video decoder reads;
// this mirrors how decord's AudioReader serves the reference ecosystem.
//
// C ABI (ctypes; see tspo_tpu/video/native.py):
//   tspo_audio_probe(path, &nsamples, &sample_rate) -> 0 on success
//     (nsamples/rate of the SOURCE stream)
//   tspo_audio(path, target_sr, out, out_cap) -> samples written (mono
//     float32 at target_sr), or -1 on failure.  Truncates at out_cap.

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
}

#include <algorithm>
#include <cstring>
#include <vector>

namespace {

struct AudioReader {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  SwrContext* swr = nullptr;
  int stream_index = -1;

  ~AudioReader() {
    if (swr) swr_free(&swr);
    if (codec) avcodec_free_context(&codec);
    if (fmt) avformat_close_input(&fmt);
  }

  bool open(const char* path, int target_sr) {
    if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return false;
    if (avformat_find_stream_info(fmt, nullptr) < 0) return false;
    stream_index =
        av_find_best_stream(fmt, AVMEDIA_TYPE_AUDIO, -1, -1, nullptr, 0);
    if (stream_index < 0) return false;
    AVStream* st = fmt->streams[stream_index];
    const AVCodec* dec = avcodec_find_decoder(st->codecpar->codec_id);
    if (!dec) return false;
    codec = avcodec_alloc_context3(dec);
    if (!codec || avcodec_parameters_to_context(codec, st->codecpar) < 0)
      return false;
    if (avcodec_open2(codec, dec, nullptr) < 0) return false;
    if (target_sr > 0) {
      AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
      if (swr_alloc_set_opts2(&swr, &mono, AV_SAMPLE_FMT_FLT, target_sr,
                              &codec->ch_layout, codec->sample_fmt,
                              codec->sample_rate, 0, nullptr) < 0)
        return false;
      if (swr_init(swr) < 0) return false;
    }
    return true;
  }
};

}  // namespace

extern "C" {

int tspo_audio_probe(const char* path, long long* nsamples,
                     int* sample_rate) {
  AudioReader r;
  if (!r.open(path, 0)) return -1;
  AVStream* st = r.fmt->streams[r.stream_index];
  *sample_rate = r.codec->sample_rate;
  if (st->duration > 0 && st->time_base.den > 0)
    *nsamples = (long long)(st->duration * av_q2d(st->time_base) *
                            r.codec->sample_rate);
  else if (r.fmt->duration > 0)
    *nsamples = (long long)((double)r.fmt->duration / AV_TIME_BASE *
                            r.codec->sample_rate);
  else
    *nsamples = 0;
  return 0;
}

long long tspo_audio(const char* path, int target_sr, float* out,
                     long long out_cap) {
  // target_sr <= 0 would skip swr allocation and drain() would dereference
  // a null SwrContext — reject up front.
  if (target_sr <= 0 || !out || out_cap <= 0) return -1;
  AudioReader r;
  if (!r.open(path, target_sr)) return -1;
  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  long long written = 0;
  std::vector<float> chunk;

  auto drain = [&](AVFrame* in) {
    // worst-case output count for this input (or flush when in == nullptr)
    int in_n = in ? in->nb_samples : 0;
    int64_t max_out = swr_get_delay(r.swr, target_sr) +
                      av_rescale_rnd(in_n, target_sr, r.codec->sample_rate,
                                     AV_ROUND_UP) + 64;
    chunk.resize((size_t)max_out);
    uint8_t* outp[1] = {reinterpret_cast<uint8_t*>(chunk.data())};
    int got = swr_convert(r.swr, outp, (int)max_out,
                          in ? const_cast<const uint8_t**>(in->extended_data)
                             : nullptr,
                          in_n);
    if (got > 0) {
      long long take = std::min<long long>(got, out_cap - written);
      if (take > 0) {
        std::memcpy(out + written, chunk.data(), (size_t)take * sizeof(float));
        written += take;
      }
    }
  };

  bool full = false;
  while (!full && av_read_frame(r.fmt, pkt) >= 0) {
    if (pkt->stream_index == r.stream_index &&
        avcodec_send_packet(r.codec, pkt) >= 0) {
      while (avcodec_receive_frame(r.codec, frame) >= 0) {
        drain(frame);
        if (written >= out_cap) { full = true; break; }
      }
    }
    av_packet_unref(pkt);
  }
  if (!full) {
    // flush decoder then resampler
    if (avcodec_send_packet(r.codec, nullptr) >= 0) {
      while (avcodec_receive_frame(r.codec, frame) >= 0) {
        drain(frame);
        if (written >= out_cap) break;
      }
    }
    if (written < out_cap) drain(nullptr);
  }
  av_frame_free(&frame);
  av_packet_free(&pkt);
  return written;
}

}  // extern "C"
