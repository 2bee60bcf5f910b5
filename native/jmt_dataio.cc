// jmt_dataio — native host-side data IO for jmt_tpu.
//
// The reference's data pipeline burns DataLoader worker processes on ~144
// PIL JPEG decodes + 16 torchaudio wav reads per sample (SURVEY.md §3.4) —
// all Python/PIL. This library provides the equivalents in C++:
//   * batched JPEG decode (libjpeg) with a pthread pool
//   * RIFF/WAV PCM16 decode with left-zero-padding to a fixed length
//   * batched wav decode
// Exposed over a plain C ABI for ctypes (no pybind11 in this image).
//
// Build: make -C native   ->  native/libjmtdataio.so

#include <cstddef>  // size_t before jpeglib.h (its header doesn't pull it in)
#include <cstdio>

#include <jpeglib.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <pthread.h>

extern "C" {

// ---------------------------------------------------------------------------
// JPEG decode
// ---------------------------------------------------------------------------
struct JmtJpegError {
  jpeg_error_mgr mgr;
  jmp_buf setjmp_buffer;
};

static void jmt_jpeg_error_exit(j_common_ptr cinfo) {
  JmtJpegError* err = reinterpret_cast<JmtJpegError*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode one JPEG into out (h*w*3, RGB). The image is cropped (top-left) or
// zero-padded to (h, w) — Affwild2 crops are already 112x112, so this is a
// straight copy in practice. Returns 0 on success.
int jmt_decode_jpeg(const char* path, uint8_t* out, int h, int w) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;

  jpeg_decompress_struct cinfo;
  JmtJpegError jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jmt_jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 3;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  const int src_w = static_cast<int>(cinfo.output_width);
  const int src_h = static_cast<int>(cinfo.output_height);
  const int copy_w = src_w < w ? src_w : w;

  JSAMPARRAY row = (*cinfo.mem->alloc_sarray)(
      reinterpret_cast<j_common_ptr>(&cinfo), JPOOL_IMAGE,
      src_w * cinfo.output_components, 1);

  memset(out, 0, static_cast<size_t>(h) * w * 3);
  int y = 0;
  while (cinfo.output_scanline < cinfo.output_height) {
    jpeg_read_scanlines(&cinfo, row, 1);
    if (y < h) {
      memcpy(out + static_cast<size_t>(y) * w * 3, row[0],
             static_cast<size_t>(copy_w) * 3);
    }
    y++;
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return 0;
}

struct JpegBatchTask {
  const char** paths;
  uint8_t* out;
  int h, w, n;
  int* status;
  int next;  // guarded by lock
  pthread_mutex_t lock;
};

static void* jpeg_batch_worker(void* arg) {
  JpegBatchTask* t = static_cast<JpegBatchTask*>(arg);
  for (;;) {
    pthread_mutex_lock(&t->lock);
    int i = t->next++;
    pthread_mutex_unlock(&t->lock);
    if (i >= t->n) break;
    t->status[i] = jmt_decode_jpeg(
        t->paths[i], t->out + static_cast<size_t>(i) * t->h * t->w * 3,
        t->h, t->w);
  }
  return nullptr;
}

// Decode n JPEGs into out (n, h, w, 3) with `threads` workers.
// status[i] = per-image result (0 ok). Returns count of failures.
int jmt_decode_jpeg_batch(const char** paths, int n, uint8_t* out, int h,
                          int w, int threads, int* status) {
  if (threads < 1) threads = 1;
  if (threads > 16) threads = 16;
  JpegBatchTask task{paths, out, h, w, n, status, 0,
                     PTHREAD_MUTEX_INITIALIZER};
  pthread_t tids[16];
  for (int i = 0; i < threads; i++)
    pthread_create(&tids[i], nullptr, jpeg_batch_worker, &task);
  for (int i = 0; i < threads; i++) pthread_join(tids[i], nullptr);
  int fails = 0;
  for (int i = 0; i < n; i++) fails += (status[i] != 0);
  return fails;
}

// ---------------------------------------------------------------------------
// WAV decode (RIFF PCM16/PCM32/float32, first channel)
// ---------------------------------------------------------------------------
// Fills out[0..out_len) with the wav LEFT-zero-padded (dataset_new.py:305) —
// the tail of the signal ends at out[out_len-1]; longer wavs keep their
// tail. Returns 0 on success.
int jmt_decode_wav(const char* path, float* out, int out_len) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  uint8_t hdr[12];
  if (fread(hdr, 1, 12, f) != 12 || memcmp(hdr, "RIFF", 4) ||
      memcmp(hdr + 8, "WAVE", 4)) {
    fclose(f);
    return 2;
  }
  uint16_t audio_format = 0, channels = 0, bits = 0;
  uint32_t data_size = 0;
  long data_pos = -1;
  // walk chunks
  for (;;) {
    uint8_t chdr[8];
    if (fread(chdr, 1, 8, f) != 8) break;
    uint32_t sz;
    memcpy(&sz, chdr + 4, 4);
    if (!memcmp(chdr, "fmt ", 4)) {
      uint8_t fmt[16];
      if (fread(fmt, 1, 16, f) != 16) break;
      memcpy(&audio_format, fmt, 2);
      memcpy(&channels, fmt + 2, 2);
      memcpy(&bits, fmt + 14, 2);
      if (sz > 16) fseek(f, sz - 16, SEEK_CUR);
    } else if (!memcmp(chdr, "data", 4)) {
      data_size = sz;
      data_pos = ftell(f);
      break;
    } else {
      fseek(f, sz + (sz & 1), SEEK_CUR);
    }
  }
  if (data_pos < 0 || channels == 0) {
    fclose(f);
    return 3;
  }
  const int bytes_per = bits / 8;
  const long n_frames = data_size / (bytes_per * channels);
  memset(out, 0, sizeof(float) * out_len);
  // read only the tail that fits
  long start_frame = 0;
  int out_off = out_len - static_cast<int>(n_frames);
  if (n_frames > out_len) {
    start_frame = n_frames - out_len;
    out_off = 0;
  }
  fseek(f, data_pos + start_frame * bytes_per * channels, SEEK_SET);
  const long todo = n_frames - start_frame;
  // buffered read
  const int BUF = 4096;
  uint8_t buf[4096 * 8];
  long done = 0;
  while (done < todo) {
    long chunk = todo - done < BUF ? todo - done : BUF;
    size_t got = fread(buf, bytes_per * channels, chunk, f);
    if (got == 0) break;
    for (size_t i = 0; i < got; i++) {
      const uint8_t* p = buf + i * bytes_per * channels;  // first channel
      float v = 0.f;
      if (audio_format == 3 && bits == 32) {
        memcpy(&v, p, 4);
      } else if (bits == 16) {
        int16_t s;
        memcpy(&s, p, 2);
        v = s / 32768.0f;
      } else if (bits == 32) {
        int32_t s;
        memcpy(&s, p, 4);
        v = s / 2147483648.0f;
      } else if (bits == 8) {
        v = (p[0] - 128) / 128.0f;
      }
      out[out_off + done + i] = v;
    }
    done += got;
  }
  fclose(f);
  return 0;
}

// Batched wav decode: out (n, out_len). Returns failure count; failed rows
// stay zero (the reference zero-fills missing audio, dataset_val.py:321).
int jmt_decode_wav_batch(const char** paths, int n, float* out,
                         int out_len) {
  int fails = 0;
  for (int i = 0; i < n; i++) {
    if (jmt_decode_wav(paths[i], out + static_cast<size_t>(i) * out_len,
                       out_len) != 0)
      fails++;
  }
  return fails;
}

}  // extern "C"
