// prisma_tpu native video codec — libav-backed decode/encode shared library.
//
// TPU-native replacement for the reference's host video path (PyAV VideoWriter,
// /root/reference/bands/common/io.py:246-305, and decord readers, io.py:63-67):
// a thin C API (ctypes-consumable from Python) around libavformat/libavcodec/
// libswscale, doing all pixel-format conversion and x264 encoding in native code
// so the Python driver thread only moves uint8 buffers between the device stream
// and this library. Output semantics match the reference writer: libx264,
// yuv420p, crf (default 15), dimensions capped at 3840 and rounded to even.
//
// Build: see native/Makefile (g++ -shared, links avformat/avcodec/avutil/swscale).

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswscale/swscale.h>
}

#include <cmath>
#include <immintrin.h>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>

// Normalize the SSE FP environment for encode calls: threads that previously
// ran XLA/Eigen compute may carry FTZ/DAZ in MXCSR, and x264's float paths
// (adaptive quant, mbtree) then produce different bitstreams for identical
// input.  One ldmxcsr makes the encoder's numeric environment deterministic
// regardless of which thread drives it.
struct FpEnvGuard {
  unsigned int saved;
  FpEnvGuard() : saved(_mm_getcsr()) { _mm_setcsr(0x1f80); }
  ~FpEnvGuard() { _mm_setcsr(saved); }
};

static thread_local std::string g_error;

static void set_error(const std::string& msg, int averr = 0) {
  if (averr != 0) {
    char buf[256];
    av_strerror(averr, buf, sizeof(buf));
    g_error = msg + ": " + buf;
  } else {
    g_error = msg;
  }
}

extern "C" const char* pvc_last_error() { return g_error.c_str(); }

// Quiet libav's per-encode x264 banners/stats by default so band CLIs print
// clean output; PVC_LOG=info|verbose|debug restores them for diagnosis.
namespace {
struct LogLevelInit {
  LogLevelInit() {
    const char* lvl = getenv("PVC_LOG");
    if (!lvl || !*lvl) av_log_set_level(AV_LOG_ERROR);
    else if (!strcmp(lvl, "debug")) av_log_set_level(AV_LOG_DEBUG);
    else if (!strcmp(lvl, "verbose")) av_log_set_level(AV_LOG_VERBOSE);
    else if (!strcmp(lvl, "info")) av_log_set_level(AV_LOG_INFO);
    else av_log_set_level(AV_LOG_ERROR);
  }
} g_log_level_init;
}  // namespace

// ---------------------------------------------------------------------------
// Reader
// ---------------------------------------------------------------------------

struct Reader {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* dec = nullptr;
  SwsContext* sws = nullptr;
  AVFrame* frame = nullptr;
  AVPacket* pkt = nullptr;
  int stream_idx = -1;
  int width = 0, height = 0;
  double fps = 0.0;
  int64_t nframes = 0;
  bool eof_sent = false;
};

static void reader_free(Reader* r) {
  if (!r) return;
  if (r->sws) sws_freeContext(r->sws);
  if (r->frame) av_frame_free(&r->frame);
  if (r->pkt) av_packet_free(&r->pkt);
  if (r->dec) avcodec_free_context(&r->dec);
  if (r->fmt) avformat_close_input(&r->fmt);
  delete r;
}

// Count video packets by demuxing the whole file once (no decode). Exact for
// the h264-in-mp4 streams this pipeline produces and consumes.
static int64_t count_packets(const char* path, int stream_idx) {
  AVFormatContext* fmt = nullptr;
  if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return 0;
  if (avformat_find_stream_info(fmt, nullptr) < 0) {
    avformat_close_input(&fmt);
    return 0;
  }
  AVPacket* pkt = av_packet_alloc();
  int64_t n = 0;
  while (av_read_frame(fmt, pkt) >= 0) {
    if (pkt->stream_index == stream_idx) n++;
    av_packet_unref(pkt);
  }
  av_packet_free(&pkt);
  avformat_close_input(&fmt);
  return n;
}

extern "C" void* pvc_open_reader(const char* path) {
  Reader* r = new Reader();
  int err = avformat_open_input(&r->fmt, path, nullptr, nullptr);
  if (err < 0) {
    set_error(std::string("open_input ") + path, err);
    reader_free(r);
    return nullptr;
  }
  if ((err = avformat_find_stream_info(r->fmt, nullptr)) < 0) {
    set_error("find_stream_info", err);
    reader_free(r);
    return nullptr;
  }
  const AVCodec* codec = nullptr;
  r->stream_idx = av_find_best_stream(r->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &codec, 0);
  if (r->stream_idx < 0 || !codec) {
    set_error("no video stream");
    reader_free(r);
    return nullptr;
  }
  AVStream* st = r->fmt->streams[r->stream_idx];
  r->dec = avcodec_alloc_context3(codec);
  avcodec_parameters_to_context(r->dec, st->codecpar);
  r->dec->thread_count = 0;  // auto
  if ((err = avcodec_open2(r->dec, codec, nullptr)) < 0) {
    set_error("avcodec_open2", err);
    reader_free(r);
    return nullptr;
  }
  r->width = r->dec->width;
  r->height = r->dec->height;
  AVRational fr = av_guess_frame_rate(r->fmt, st, nullptr);
  r->fps = fr.den ? (double)fr.num / fr.den : 0.0;
  r->nframes = st->nb_frames;
  if (r->nframes <= 0) r->nframes = count_packets(path, r->stream_idx);
  if (r->nframes <= 0 && r->fps > 0 && r->fmt->duration > 0)
    r->nframes = (int64_t)llround(r->fmt->duration / (double)AV_TIME_BASE * r->fps);
  r->frame = av_frame_alloc();
  r->pkt = av_packet_alloc();
  return r;
}

extern "C" int pvc_reader_info(void* h, int* w, int* hgt, double* fps, int64_t* nframes) {
  Reader* r = (Reader*)h;
  *w = r->width;
  *hgt = r->height;
  *fps = r->fps;
  *nframes = r->nframes;
  return 0;
}

// Decode the next frame into r->frame. Returns 1 on success, 0 on EOF, <0 error.
static int reader_next(Reader* r) {
  while (true) {
    int err = avcodec_receive_frame(r->dec, r->frame);
    if (err == 0) return 1;
    if (err == AVERROR_EOF) return 0;
    if (err != AVERROR(EAGAIN)) {
      set_error("receive_frame", err);
      return -1;
    }
    // feed more packets
    while (true) {
      err = av_read_frame(r->fmt, r->pkt);
      if (err == AVERROR_EOF) {
        if (!r->eof_sent) {
          avcodec_send_packet(r->dec, nullptr);
          r->eof_sent = true;
        }
        break;
      }
      if (err < 0) {
        set_error("read_frame", err);
        return -1;
      }
      if (r->pkt->stream_index == r->stream_idx) {
        err = avcodec_send_packet(r->dec, r->pkt);
        av_packet_unref(r->pkt);
        if (err < 0 && err != AVERROR(EAGAIN)) {
          set_error("send_packet", err);
          return -1;
        }
        break;
      }
      av_packet_unref(r->pkt);
    }
  }
}

// Decode the next frame into an RGB24 buffer of size height*width*3.
// Returns 1 on success, 0 on EOF, <0 on error.
extern "C" int pvc_read_frame(void* h, uint8_t* out) {
  FpEnvGuard fp_guard;
  Reader* r = (Reader*)h;
  int rc = reader_next(r);
  if (rc != 1) return rc;
  r->sws = sws_getCachedContext(r->sws, r->frame->width, r->frame->height,
                                (AVPixelFormat)r->frame->format, r->width, r->height,
                                AV_PIX_FMT_RGB24,
                                SWS_BILINEAR | SWS_BITEXACT | SWS_ACCURATE_RND,
                                nullptr, nullptr, nullptr);
  uint8_t* dst[4] = {out, nullptr, nullptr, nullptr};
  int dst_stride[4] = {r->width * 3, 0, 0, 0};
  sws_scale(r->sws, r->frame->data, r->frame->linesize, 0, r->frame->height, dst, dst_stride);
  av_frame_unref(r->frame);
  return 1;
}

// Decode and discard n frames (no pixel conversion) — frame-index resume seek.
// Returns the number of frames actually skipped, or <0 on error.
extern "C" int64_t pvc_reader_skip(void* h, int64_t n) {
  Reader* r = (Reader*)h;
  int64_t skipped = 0;
  while (skipped < n) {
    int rc = reader_next(r);
    if (rc < 0) return -1;
    if (rc == 0) break;
    av_frame_unref(r->frame);
    skipped++;
  }
  return skipped;
}

extern "C" void pvc_close_reader(void* h) { reader_free((Reader*)h); }

// ---------------------------------------------------------------------------
// Stream-copy concatenation (segment remux for frame-index resume)
// ---------------------------------------------------------------------------

// Concatenate same-codec mp4 segments into out_path WITHOUT re-encoding:
// demux each input, offset timestamps, remux. Segments come from pvc writers
// with identical settings, so per-packet durations and decoder delay match.
extern "C" int pvc_concat(const char* out_path, const char* const* inputs, int n) {
  if (n <= 0) {
    set_error("pvc_concat: no inputs");
    return -1;
  }
  AVFormatContext* out = nullptr;
  int err = avformat_alloc_output_context2(&out, nullptr, nullptr, out_path);
  if (err < 0 || !out) {
    set_error("concat alloc_output_context", err);
    return -1;
  }

  // configure the output stream from the first segment
  {
    AVFormatContext* in0 = nullptr;
    if ((err = avformat_open_input(&in0, inputs[0], nullptr, nullptr)) < 0 ||
        (err = avformat_find_stream_info(in0, nullptr)) < 0) {
      set_error(std::string("concat open ") + inputs[0], err);
      if (in0) avformat_close_input(&in0);
      avformat_free_context(out);
      return -1;
    }
    int vidx = av_find_best_stream(in0, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
    if (vidx < 0) {
      set_error("concat: no video stream in first segment");
      avformat_close_input(&in0);
      avformat_free_context(out);
      return -1;
    }
    AVStream* ost = avformat_new_stream(out, nullptr);
    if (!ost || (err = avcodec_parameters_copy(
                     ost->codecpar, in0->streams[vidx]->codecpar)) < 0) {
      set_error("concat: output stream setup failed", ost ? err : 0);
      avformat_close_input(&in0);
      avformat_free_context(out);
      return -1;
    }
    ost->codecpar->codec_tag = 0;
    ost->time_base = in0->streams[vidx]->time_base;
    avformat_close_input(&in0);
  }

  if (!(out->oformat->flags & AVFMT_NOFILE)) {
    if ((err = avio_open(&out->pb, out_path, AVIO_FLAG_WRITE)) < 0) {
      set_error(std::string("concat avio_open ") + out_path, err);
      avformat_free_context(out);
      return -1;
    }
  }
  if ((err = avformat_write_header(out, nullptr)) < 0) {
    set_error("concat write_header", err);
    if (out->pb) avio_closep(&out->pb);
    avformat_free_context(out);
    return -1;
  }
  AVStream* ost = out->streams[0];

  AVPacket* pkt = av_packet_alloc();
  int64_t ofs = 0;
  int rc = 0;
  for (int i = 0; i < n && rc == 0; i++) {
    AVFormatContext* in = nullptr;
    if ((err = avformat_open_input(&in, inputs[i], nullptr, nullptr)) < 0 ||
        (err = avformat_find_stream_info(in, nullptr)) < 0) {
      set_error(std::string("concat open ") + inputs[i], err);
      if (in) avformat_close_input(&in);
      rc = -1;
      break;
    }
    int vidx = av_find_best_stream(in, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
    if (vidx < 0) {
      set_error(std::string("concat: no video stream in ") + inputs[i]);
      avformat_close_input(&in);
      rc = -1;
      break;
    }
    AVStream* ist = in->streams[vidx];
    int64_t seg_end = ofs;
    while (av_read_frame(in, pkt) >= 0) {
      if (pkt->stream_index != vidx) {
        av_packet_unref(pkt);
        continue;
      }
      av_packet_rescale_ts(pkt, ist->time_base, ost->time_base);
      if (pkt->duration <= 0) pkt->duration = 1;
      if (pkt->pts != AV_NOPTS_VALUE) pkt->pts += ofs;
      if (pkt->dts != AV_NOPTS_VALUE) pkt->dts += ofs;
      if (pkt->pts != AV_NOPTS_VALUE && pkt->pts + pkt->duration > seg_end)
        seg_end = pkt->pts + pkt->duration;
      pkt->stream_index = 0;
      pkt->pos = -1;
      if ((err = av_interleaved_write_frame(out, pkt)) < 0) {
        set_error("concat write_frame", err);
        rc = -1;
        break;
      }
    }
    ofs = seg_end;
    avformat_close_input(&in);
  }
  av_packet_free(&pkt);
  if (rc == 0 && (err = av_write_trailer(out)) < 0) {
    set_error("concat write_trailer", err);
    rc = -1;
  }
  if (out->pb) avio_closep(&out->pb);
  avformat_free_context(out);
  return rc;
}

// ---------------------------------------------------------------------------
// Writer
// ---------------------------------------------------------------------------

struct Writer {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* enc = nullptr;
  AVStream* stream = nullptr;
  SwsContext* sws = nullptr;
  AVFrame* frame = nullptr;
  AVPacket* pkt = nullptr;
  int width = 0, height = 0;
  int64_t next_pts = 0;
  int src_w = -1, src_h = -1, src_fmt = -1;
};

static void writer_free(Writer* w) {
  if (!w) return;
  if (w->sws) sws_freeContext(w->sws);
  if (w->frame) av_frame_free(&w->frame);
  if (w->pkt) av_packet_free(&w->pkt);
  if (w->enc) avcodec_free_context(&w->enc);
  if (w->fmt) {
    if (w->fmt->pb) avio_closep(&w->fmt->pb);
    avformat_free_context(w->fmt);
  }
  delete w;
}

// Reference VideoWriter sizing: cap the long edge at 3840, round to even.
static void fit_dims(int in_w, int in_h, int* out_w, int* out_h) {
  const int max_size = 3840;
  double w = in_w, h = in_h;
  if (in_w > max_size || in_h > max_size) {
    double ar = h / w;
    if (ar < 1.0) {
      w = max_size;
      h = llround(max_size * ar);
    } else {
      w = llround(max_size / ar);
      h = max_size;
    }
  }
  *out_w = 2 * (int)llround(w / 2.0);
  *out_h = 2 * (int)llround(h / 2.0);
}

extern "C" void* pvc_open_writer(const char* path, int width, int height, double fps,
                                 int crf, const char* codec_name, const char* preset) {
  FpEnvGuard fp_guard;
  Writer* w = new Writer();
  fit_dims(width, height, &w->width, &w->height);

  int err = avformat_alloc_output_context2(&w->fmt, nullptr, nullptr, path);
  if (err < 0 || !w->fmt) {
    set_error("alloc_output_context", err);
    writer_free(w);
    return nullptr;
  }
  const AVCodec* codec = avcodec_find_encoder_by_name(codec_name && *codec_name ? codec_name : "libx264");
  if (!codec) codec = avcodec_find_encoder_by_name("mpeg4");
  if (!codec) {
    set_error("no usable video encoder");
    writer_free(w);
    return nullptr;
  }
  w->stream = avformat_new_stream(w->fmt, codec);
  w->enc = avcodec_alloc_context3(codec);
  w->enc->width = w->width;
  w->enc->height = w->height;
  w->enc->pix_fmt = AV_PIX_FMT_YUV420P;
  // Rational fps: the reference formats rate as "%.2f"; use exact rational when integral.
  AVRational tb;
  if (fabs(fps - llround(fps)) < 1e-6) {
    tb = AVRational{1, (int)llround(fps)};
  } else {
    tb = av_d2q(1.0 / fps, 100000);
  }
  w->enc->time_base = tb;
  w->stream->time_base = tb;
  w->enc->framerate = AVRational{tb.den, tb.num};
  w->enc->thread_count = 0;
  if (w->fmt->oformat->flags & AVFMT_GLOBALHEADER)
    w->enc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  char crf_str[16];
  snprintf(crf_str, sizeof(crf_str), "%d", crf);
  av_opt_set(w->enc->priv_data, "crf", crf_str, 0);
  // Optional x264 speed/size preset. Empty keeps the encoder default
  // ("medium"), which matches the reference writer's output settings; faster
  // presets are a production throughput lever (the band mp4 encode is the
  // host-side bottleneck of the 3-band pipeline on small hosts).
  if (preset && *preset)
    av_opt_set(w->enc->priv_data, "preset", preset, 0);

  if ((err = avcodec_open2(w->enc, codec, nullptr)) < 0) {
    set_error("encoder open", err);
    writer_free(w);
    return nullptr;
  }
  avcodec_parameters_from_context(w->stream->codecpar, w->enc);
  if (!(w->fmt->oformat->flags & AVFMT_NOFILE)) {
    if ((err = avio_open(&w->fmt->pb, path, AVIO_FLAG_WRITE)) < 0) {
      set_error(std::string("avio_open ") + path, err);
      writer_free(w);
      return nullptr;
    }
  }
  if ((err = avformat_write_header(w->fmt, nullptr)) < 0) {
    set_error("write_header", err);
    writer_free(w);
    return nullptr;
  }
  w->frame = av_frame_alloc();
  w->frame->format = AV_PIX_FMT_YUV420P;
  w->frame->width = w->width;
  w->frame->height = w->height;
  av_frame_get_buffer(w->frame, 0);
  w->pkt = av_packet_alloc();
  return w;
}

static int drain(Writer* w, bool flush) {
  int err = avcodec_send_frame(w->enc, flush ? nullptr : w->frame);
  if (err < 0) {
    set_error("send_frame", err);
    return -1;
  }
  while (true) {
    err = avcodec_receive_packet(w->enc, w->pkt);
    if (err == AVERROR(EAGAIN) || err == AVERROR_EOF) return 0;
    if (err < 0) {
      set_error("receive_packet", err);
      return -1;
    }
    if (w->pkt->duration == 0) w->pkt->duration = 1;  // one frame in enc time_base
    av_packet_rescale_ts(w->pkt, w->enc->time_base, w->stream->time_base);
    w->pkt->stream_index = w->stream->index;
    err = av_interleaved_write_frame(w->fmt, w->pkt);
    if (err < 0) {
      set_error("write_frame", err);
      return -1;
    }
  }
}


// fmt: 0 = gray8, 1 = rgb24, 2 = rgba, 3 = rgb48le (16-bit), 4 = gray16le
extern "C" int pvc_write_frame(void* h, const uint8_t* data, int in_w, int in_h, int fmt) {
  FpEnvGuard fp_guard;
  Writer* w = (Writer*)h;
  AVPixelFormat src_fmt;
  int bpp;
  switch (fmt) {
    case 0: src_fmt = AV_PIX_FMT_GRAY8; bpp = 1; break;
    case 1: src_fmt = AV_PIX_FMT_RGB24; bpp = 3; break;
    case 2: src_fmt = AV_PIX_FMT_RGBA; bpp = 4; break;
    case 3: src_fmt = AV_PIX_FMT_RGB48LE; bpp = 6; break;
    case 4: src_fmt = AV_PIX_FMT_GRAY16LE; bpp = 2; break;
    default: set_error("bad pixel format code"); return -1;
  }
  w->sws = sws_getCachedContext(w->sws, in_w, in_h, src_fmt, w->width, w->height,
                                AV_PIX_FMT_YUV420P,
                                SWS_BILINEAR | SWS_BITEXACT | SWS_ACCURATE_RND,
                                nullptr, nullptr, nullptr);
  const uint8_t* src[4] = {data, nullptr, nullptr, nullptr};
  int src_stride[4] = {in_w * bpp, 0, 0, 0};
  if (av_frame_make_writable(w->frame) < 0) {
    set_error("frame not writable");
    return -1;
  }
  // make_writable reallocates (the encoder holds refs to queued frames); sws
  // fills only the visible area, so zero the whole planes first — otherwise
  // the encoder observes heap garbage in the row padding and identical inputs
  // encode to different bitstreams depending on allocator state.
  for (int p = 0; p < 3; p++) {
    int ph = p ? (w->height + 1) / 2 : w->height;
    memset(w->frame->data[p], p ? 128 : 0, (size_t)w->frame->linesize[p] * ph);
  }
  sws_scale(w->sws, src, src_stride, 0, in_h, w->frame->data, w->frame->linesize);
  if (getenv("PVC_DEBUG_CSUM")) {
    unsigned long cs = 0;
    for (int p = 0; p < 3; p++) {
      int ph = p ? w->height / 2 : w->height, pw = p ? w->width / 2 : w->width;
      for (int y = 0; y < ph; y++)
        for (int x = 0; x < pw; x++)
          cs = cs * 1315423911ul + w->frame->data[p][y * w->frame->linesize[p] + x];
    }
    fprintf(stderr, "[pvc] frame %lld yuv_csum %lx\n", (long long)w->next_pts, cs);
  }
  w->frame->pts = w->next_pts++;
  return drain(w, false);
}

extern "C" int pvc_writer_dims(void* h, int* width, int* height) {
  Writer* w = (Writer*)h;
  *width = w->width;
  *height = w->height;
  return 0;
}

extern "C" int pvc_close_writer(void* h) {
  FpEnvGuard fp_guard;
  Writer* w = (Writer*)h;
  int rc = drain(w, true);
  if (rc == 0) {
    int err = av_write_trailer(w->fmt);
    if (err < 0) {
      set_error("write_trailer", err);
      rc = -1;
    }
  }
  writer_free(w);
  return rc;
}
