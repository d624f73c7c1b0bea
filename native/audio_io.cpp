// Native audio IO for svecalign_tpu: WAV read/write + Ogg/Vorbis decode &
// encode. Replaces the reference's libsndfile/soundfile dependency
// (reference svecalign/utils/audio_utils.py:15-35) — this image ships
// libvorbis but no libsndfile/ffmpeg.
//
// The system lacks vorbis dev headers, so the handful of libvorbis/libogg
// ABI entry points used here are declared manually below; opaque library
// states are allocated as oversized blobs (the ABI has been stable for two
// decades). Exposed to Python via a plain C API + ctypes
// (svecalign_tpu/utils/audio_io.py).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <string>
#include <vector>

// ---------------------------------------------------------------------------
// Minimal libogg/libvorbis ABI declarations
// ---------------------------------------------------------------------------

extern "C" {

typedef int64_t ogg_int64_t;

// layouts that we must read/write directly (stable public ABI)
typedef struct {
  unsigned char *packet;
  long bytes;
  long b_o_s;
  long e_o_s;
  ogg_int64_t granulepos;
  ogg_int64_t packetno;
} ogg_packet;

typedef struct {
  unsigned char *header;
  long header_len;
  unsigned char *body;
  long body_len;
} ogg_page;

typedef struct {
  int version;
  int channels;
  long rate;
  // ... remainder opaque (bitrate fields, codec_setup)
  long _pad[8];
  void *_codec_setup;
} vorbis_info_view;  // used read-only via ov_info()

// opaque state blobs, allocated generously oversized
struct OpaqueBlob512 { unsigned char _b[512]; };
struct OpaqueBlob1k { unsigned char _b[1024]; };
struct OpaqueBlob2k { unsigned char _b[2048]; };
struct OpaqueBlob8k { unsigned char _b[8192]; };

typedef OpaqueBlob8k OggVorbis_File;     // real size ~944B
typedef OpaqueBlob1k ogg_stream_state;   // real size ~408B
typedef OpaqueBlob1k vorbis_info;        // real size ~48B
typedef OpaqueBlob1k vorbis_comment;     // real size ~32B
typedef OpaqueBlob2k vorbis_dsp_state;   // real size ~160B
typedef OpaqueBlob2k vorbis_block;       // real size ~192B

// libvorbisfile (decode)
int ov_fopen(const char *path, OggVorbis_File *vf);
void *ov_info(OggVorbis_File *vf, int link);
ogg_int64_t ov_pcm_total(OggVorbis_File *vf, int link);
int ov_pcm_seek(OggVorbis_File *vf, ogg_int64_t pos);
long ov_read_float(OggVorbis_File *vf, float ***pcm_channels, int samples,
                   int *bitstream);
int ov_clear(OggVorbis_File *vf);

// libvorbis / libvorbisenc / libogg (encode)
void vorbis_info_init(vorbis_info *vi);
void vorbis_info_clear(vorbis_info *vi);
int vorbis_encode_init_vbr(vorbis_info *vi, long channels, long rate,
                           float base_quality);
void vorbis_comment_init(vorbis_comment *vc);
void vorbis_comment_clear(vorbis_comment *vc);
int vorbis_analysis_init(vorbis_dsp_state *v, vorbis_info *vi);
int vorbis_block_init(vorbis_dsp_state *v, vorbis_block *vb);
int vorbis_analysis_headerout(vorbis_dsp_state *v, vorbis_comment *vc,
                              ogg_packet *op, ogg_packet *op_comm,
                              ogg_packet *op_code);
float **vorbis_analysis_buffer(vorbis_dsp_state *v, int vals);
int vorbis_analysis_wrote(vorbis_dsp_state *v, int vals);
int vorbis_analysis_blockout(vorbis_dsp_state *v, vorbis_block *vb);
int vorbis_analysis(vorbis_block *vb, ogg_packet *op);
int vorbis_bitrate_addblock(vorbis_block *vb);
int vorbis_bitrate_flushpacket(vorbis_dsp_state *vd, ogg_packet *op);
int vorbis_block_clear(vorbis_block *vb);
void vorbis_dsp_clear(vorbis_dsp_state *v);

int ogg_stream_init(ogg_stream_state *os, int serialno);
int ogg_stream_packetin(ogg_stream_state *os, ogg_packet *op);
int ogg_stream_pageout(ogg_stream_state *os, ogg_page *og);
int ogg_stream_flush(ogg_stream_state *os, ogg_page *og);
int ogg_stream_clear(ogg_stream_state *os);
int ogg_page_eos(const ogg_page *og);

}  // extern "C"

// ---------------------------------------------------------------------------
// WAV
// ---------------------------------------------------------------------------

namespace {

struct WavInfo {
  int sample_rate = 0;
  int channels = 0;
  int bits = 0;
  int format = 0;  // 1 = PCM, 3 = IEEE float
  int64_t data_offset = 0;
  int64_t data_bytes = 0;
};

bool parse_wav_header(FILE *f, WavInfo *info) {
  unsigned char hdr[12];
  if (fread(hdr, 1, 12, f) != 12) return false;
  if (memcmp(hdr, "RIFF", 4) != 0 || memcmp(hdr + 8, "WAVE", 4) != 0)
    return false;

  unsigned char chunk[8];
  while (fread(chunk, 1, 8, f) == 8) {
    uint32_t size;
    memcpy(&size, chunk + 4, 4);
    if (memcmp(chunk, "fmt ", 4) == 0) {
      std::vector<unsigned char> fmt(size);
      if (fread(fmt.data(), 1, size, f) != size) return false;
      uint16_t format, channels, bits;
      uint32_t rate;
      memcpy(&format, fmt.data(), 2);
      memcpy(&channels, fmt.data() + 2, 2);
      memcpy(&rate, fmt.data() + 4, 4);
      memcpy(&bits, fmt.data() + 14, 2);
      if (format == 0xFFFE && size >= 40) {  // WAVE_FORMAT_EXTENSIBLE
        memcpy(&format, fmt.data() + 24, 2);
      }
      info->format = format;
      info->channels = channels;
      info->sample_rate = (int)rate;
      info->bits = bits;
    } else if (memcmp(chunk, "data", 4) == 0) {
      info->data_offset = ftell(f);
      info->data_bytes = size;
      return info->sample_rate > 0;
    } else {
      fseek(f, (long)((size + 1) & ~1u), SEEK_CUR);  // chunks are word-aligned
    }
  }
  return false;
}

}  // namespace

extern "C" {

// Query sample rate / frames / channels. Returns 0 on success.
int sva_audio_info(const char *path, int *sample_rate, int64_t *frames,
                   int *channels) {
  size_t len = strlen(path);
  if (len > 4 && strcmp(path + len - 4, ".ogg") == 0) {
    OggVorbis_File vf;
    if (ov_fopen(path, &vf) != 0) return -1;
    vorbis_info_view *vi = (vorbis_info_view *)ov_info(&vf, -1);
    *sample_rate = (int)vi->rate;
    *channels = vi->channels;
    *frames = ov_pcm_total(&vf, -1);
    ov_clear(&vf);
    return 0;
  }
  FILE *f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  if (!parse_wav_header(f, &info)) {
    fclose(f);
    return -2;
  }
  fclose(f);
  *sample_rate = info.sample_rate;
  *channels = info.channels;
  *frames = info.data_bytes / (info.channels * info.bits / 8);
  return 0;
}

// Read [start, start+count) frames as interleaved float32 into out.
// Returns frames read, or negative on error.
int64_t sva_audio_read(const char *path, int64_t start, int64_t count,
                       float *out) {
  size_t len = strlen(path);
  if (len > 4 && strcmp(path + len - 4, ".ogg") == 0) {
    OggVorbis_File vf;
    if (ov_fopen(path, &vf) != 0) return -1;
    vorbis_info_view *vi = (vorbis_info_view *)ov_info(&vf, -1);
    int ch = vi->channels;
    if (ov_pcm_seek(&vf, start) != 0) {
      ov_clear(&vf);
      return -3;
    }
    int64_t done = 0;
    int bitstream = 0;
    while (done < count) {
      float **pcm;
      long want = (long)((count - done) > 4096 ? 4096 : (count - done));
      long got = ov_read_float(&vf, &pcm, want, &bitstream);
      if (got <= 0) break;  // EOF or hole
      for (long i = 0; i < got; ++i)
        for (int c = 0; c < ch; ++c) out[(done + i) * ch + c] = pcm[c][i];
      done += got;
    }
    ov_clear(&vf);
    return done;
  }

  FILE *f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  if (!parse_wav_header(f, &info)) {
    fclose(f);
    return -2;
  }
  int frame_bytes = info.channels * info.bits / 8;
  int64_t total = info.data_bytes / frame_bytes;
  if (start > total) start = total;
  if (count > total - start) count = total - start;
  fseek(f, (long)(info.data_offset + start * frame_bytes), SEEK_SET);

  int64_t n_vals = count * info.channels;
  if (info.format == 3 && info.bits == 32) {
    if (fread(out, 4, n_vals, f) != (size_t)n_vals) count = -4;
  } else if (info.format == 1 && info.bits == 16) {
    std::vector<int16_t> buf(n_vals);
    if (fread(buf.data(), 2, n_vals, f) != (size_t)n_vals) {
      count = -4;
    } else {
      for (int64_t i = 0; i < n_vals; ++i) out[i] = buf[i] / 32768.0f;
    }
  } else if (info.format == 1 && info.bits == 32) {
    std::vector<int32_t> buf(n_vals);
    if (fread(buf.data(), 4, n_vals, f) != (size_t)n_vals) {
      count = -4;
    } else {
      for (int64_t i = 0; i < n_vals; ++i) out[i] = buf[i] / 2147483648.0f;
    }
  } else if (info.format == 1 && info.bits == 24) {
    std::vector<unsigned char> buf(n_vals * 3);
    if (fread(buf.data(), 3, n_vals, f) != (size_t)n_vals) {
      count = -4;
    } else {
      for (int64_t i = 0; i < n_vals; ++i) {
        int32_t v = (buf[i * 3] << 8) | (buf[i * 3 + 1] << 16) |
                    (buf[i * 3 + 2] << 24);
        out[i] = (v >> 8) / 8388608.0f;
      }
    }
  } else {
    count = -5;  // unsupported encoding
  }
  fclose(f);
  return count;
}

// Write interleaved float32 frames as 16-bit PCM WAV. Returns 0 on success.
int sva_wav_write(const char *path, const float *data, int64_t frames,
                  int channels, int sample_rate) {
  FILE *f = fopen(path, "wb");
  if (!f) return -1;
  int64_t n_vals = frames * channels;
  uint32_t data_bytes = (uint32_t)(n_vals * 2);
  uint32_t riff_size = 36 + data_bytes;
  uint16_t fmt = 1, ch = (uint16_t)channels, bits = 16;
  uint32_t rate = (uint32_t)sample_rate;
  uint32_t byte_rate = rate * ch * 2;
  uint16_t block_align = ch * 2;
  uint32_t fmt_size = 16;

  fwrite("RIFF", 1, 4, f);
  fwrite(&riff_size, 4, 1, f);
  fwrite("WAVE", 1, 4, f);
  fwrite("fmt ", 1, 4, f);
  fwrite(&fmt_size, 4, 1, f);
  fwrite(&fmt, 2, 1, f);
  fwrite(&ch, 2, 1, f);
  fwrite(&rate, 4, 1, f);
  fwrite(&byte_rate, 4, 1, f);
  fwrite(&block_align, 2, 1, f);
  fwrite(&bits, 2, 1, f);
  fwrite("data", 1, 4, f);
  fwrite(&data_bytes, 4, 1, f);

  std::vector<int16_t> buf(n_vals);
  for (int64_t i = 0; i < n_vals; ++i) {
    float v = data[i];
    if (v > 1.0f) v = 1.0f;
    if (v < -1.0f) v = -1.0f;
    buf[i] = (int16_t)(v * 32767.0f);
  }
  size_t written = fwrite(buf.data(), 2, n_vals, f);
  fclose(f);
  return written == (size_t)n_vals ? 0 : -2;
}

// Write interleaved float32 frames as an Ogg/Vorbis file (VBR).
// Returns 0 on success. Classic libvorbis encode loop.
int sva_ogg_write(const char *path, const float *data, int64_t frames,
                  int channels, int sample_rate, float quality) {
  vorbis_info vi;
  vorbis_info_init(&vi);
  if (vorbis_encode_init_vbr(&vi, channels, sample_rate, quality) != 0) {
    vorbis_info_clear(&vi);
    return -1;
  }

  vorbis_comment vc;
  vorbis_comment_init(&vc);
  vorbis_dsp_state vd;
  vorbis_analysis_init(&vd, &vi);
  vorbis_block vb;
  vorbis_block_init(&vd, &vb);

  ogg_stream_state os;
  ogg_stream_init(&os, 0x53564100);  // arbitrary fixed serial ("SVA")

  FILE *f = fopen(path, "wb");
  if (!f) {
    ogg_stream_clear(&os);
    vorbis_block_clear(&vb);
    vorbis_dsp_clear(&vd);
    vorbis_comment_clear(&vc);
    vorbis_info_clear(&vi);
    return -2;
  }

  ogg_packet header, header_comm, header_code;
  vorbis_analysis_headerout(&vd, &vc, &header, &header_comm, &header_code);
  ogg_stream_packetin(&os, &header);
  ogg_stream_packetin(&os, &header_comm);
  ogg_stream_packetin(&os, &header_code);

  ogg_page og;
  while (ogg_stream_flush(&os, &og) != 0) {
    fwrite(og.header, 1, og.header_len, f);
    fwrite(og.body, 1, og.body_len, f);
  }

  const int64_t CHUNK = 4096;
  int64_t pos = 0;
  bool eos = false;
  while (!eos) {
    int64_t n = frames - pos;
    if (n > CHUNK) n = CHUNK;
    if (n > 0) {
      float **buffer = vorbis_analysis_buffer(&vd, (int)n);
      for (int64_t i = 0; i < n; ++i)
        for (int c = 0; c < channels; ++c)
          buffer[c][i] = data[(pos + i) * channels + c];
    }
    vorbis_analysis_wrote(&vd, (int)(n > 0 ? n : 0));
    pos += n;

    while (vorbis_analysis_blockout(&vd, &vb) == 1) {
      vorbis_analysis(&vb, nullptr);
      vorbis_bitrate_addblock(&vb);
      ogg_packet op;
      while (vorbis_bitrate_flushpacket(&vd, &op) == 1) {
        ogg_stream_packetin(&os, &op);
        while (!eos && ogg_stream_pageout(&os, &og) != 0) {
          fwrite(og.header, 1, og.header_len, f);
          fwrite(og.body, 1, og.body_len, f);
          if (ogg_page_eos(&og)) eos = true;
        }
      }
    }
    if (pos >= frames && n <= 0) {
      // vorbis_analysis_wrote(vd, 0) above signalled EOS; drain pages
      while (ogg_stream_flush(&os, &og) != 0) {
        fwrite(og.header, 1, og.header_len, f);
        fwrite(og.body, 1, og.body_len, f);
      }
      eos = true;
    }
  }

  fclose(f);
  ogg_stream_clear(&os);
  vorbis_block_clear(&vb);
  vorbis_dsp_clear(&vd);
  vorbis_comment_clear(&vc);
  vorbis_info_clear(&vi);
  return 0;
}

}  // extern "C"
