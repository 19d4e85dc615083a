// vargp_tpu native data loader.
//
// The reference's input pipeline is torch DataLoader workers
// (experiments/vargp.py:26); the TPU-native rebuild feeds fixed-shape
// epochs (train/loop.py stack_epoch), whose host-side cost is the
// shuffle-gather of the dataset into batch order.  numpy fancy indexing
// does this single-threaded with an intermediate copy; this library does a
// parallel row gather plus IDX (MNIST) parsing, exposed through ctypes
// (vargp_tpu/data/loader.py).
//
// Build: make -C native   (produces libvargp_loader.so)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Parallel row gather: out[i, :] = src[idx[i], :].
// src: (n_rows, row_len) float32; idx: (n_out,) int64.
void gather_rows_f32(const float* src, int64_t n_rows, int64_t row_len,
                     const int64_t* idx, int64_t n_out, float* out,
                     int n_threads) {
  if (n_threads <= 0) n_threads = (int)std::thread::hardware_concurrency();
  if (n_threads <= 1 || n_out < 1024) {
    for (int64_t i = 0; i < n_out; ++i) {
      std::memcpy(out + i * row_len, src + idx[i] * row_len,
                  sizeof(float) * (size_t)row_len);
    }
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n_out + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = lo + chunk < n_out ? lo + chunk : n_out;
    if (lo >= hi) break;
    threads.emplace_back([=]() {
      for (int64_t i = lo; i < hi; ++i) {
        std::memcpy(out + i * row_len, src + idx[i] * row_len,
                    sizeof(float) * (size_t)row_len);
      }
    });
  }
  for (auto& th : threads) th.join();
}

// int32 label gather.
void gather_rows_i32(const int32_t* src, const int64_t* idx, int64_t n_out,
                     int32_t* out) {
  for (int64_t i = 0; i < n_out; ++i) out[i] = src[idx[i]];
}

// Parse an (already-decompressed) IDX ubyte image file into float32 / 255.
// Returns 0 on success; fills dims[0..2] with (count, rows, cols).
int parse_idx_images_f32(const char* path, float* out, int64_t out_capacity,
                         int64_t* dims) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  unsigned char header[16];
  if (std::fread(header, 1, 16, f) != 16) { std::fclose(f); return 2; }
  if (header[2] != 0x08 || header[3] != 3) { std::fclose(f); return 3; }
  auto be32 = [](const unsigned char* p) {
    return ((int64_t)p[0] << 24) | ((int64_t)p[1] << 16) |
           ((int64_t)p[2] << 8) | (int64_t)p[3];
  };
  int64_t n = be32(header + 4), r = be32(header + 8), c = be32(header + 12);
  dims[0] = n; dims[1] = r; dims[2] = c;
  int64_t total = n * r * c;
  if (out_capacity < total) { std::fclose(f); return 4; }
  std::vector<unsigned char> buf((size_t)total);
  if ((int64_t)std::fread(buf.data(), 1, (size_t)total, f) != total) {
    std::fclose(f);
    return 5;
  }
  std::fclose(f);
  const float inv = 1.0f / 255.0f;
  for (int64_t i = 0; i < total; ++i) out[i] = buf[(size_t)i] * inv;
  return 0;
}

// Parse an IDX ubyte label file into int32.
int parse_idx_labels_i32(const char* path, int32_t* out, int64_t out_capacity,
                         int64_t* count) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  unsigned char header[8];
  if (std::fread(header, 1, 8, f) != 8) { std::fclose(f); return 2; }
  if (header[2] != 0x08 || header[3] != 1) { std::fclose(f); return 3; }
  int64_t n = ((int64_t)header[4] << 24) | ((int64_t)header[5] << 16) |
              ((int64_t)header[6] << 8) | (int64_t)header[7];
  *count = n;
  if (out_capacity < n) { std::fclose(f); return 4; }
  std::vector<unsigned char> buf((size_t)n);
  if ((int64_t)std::fread(buf.data(), 1, (size_t)n, f) != n) {
    std::fclose(f);
    return 5;
  }
  std::fclose(f);
  for (int64_t i = 0; i < n; ++i) out[i] = buf[(size_t)i];
  return 0;
}

}  // extern "C"
