// Native data loader for tpu3dssf.
//
// Role: the reference delegates its hot host-side IO to native code via
// torch's C++ DataLoader workers + numpy fromfile (utils/dataloader.py:
// 63-75). Here the equivalent is explicit: read the nuScenes LiDAR .bin
// (P,5 float32) and lidarseg .bin (P uint8), remap labels through a LUT,
// and pack points/labels/masks into the caller's fixed-capacity buffers —
// one C call per sample, no Python-object churn, GIL released for the
// duration (ctypes releases it around foreign calls).
//
// Build: make -C csrc   → csrc/libtpu3dssf_io.so
//
// ABI kept deliberately C-plain for ctypes.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

extern "C" {

// Returns number of points read (rows of 5 floats), or -1 on error.
// Caller owns `out` with room for `capacity * 4` floats: x,y,z,intensity
// (the 5th channel — ring index — is dropped, dataloader.py:71).
int64_t tpu3dssf_read_lidar_bin(const char* path, float* out,
                                int64_t capacity) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  const long bytes = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  const int64_t total = bytes / (5 * (int64_t)sizeof(float));
  const int64_t n = total < capacity ? total : capacity;

  constexpr int64_t kChunk = 4096;
  std::vector<float> buf(kChunk * 5);
  int64_t done = 0;
  while (done < n) {
    const int64_t take = (n - done) < kChunk ? (n - done) : kChunk;
    if (std::fread(buf.data(), sizeof(float) * 5, take, f) !=
        (size_t)take) {
      std::fclose(f);
      return -1;
    }
    for (int64_t i = 0; i < take; ++i) {
      std::memcpy(out + (done + i) * 4, buf.data() + i * 5,
                  4 * sizeof(float));
    }
    done += take;
  }
  std::fclose(f);
  return n;
}

// Reads P uint8 labels, remaps through lut (lut_len entries), writes
// int32 labels. Returns count or -1.
int64_t tpu3dssf_read_labels(const char* path, const uint8_t* lut,
                             int64_t lut_len, int32_t* out,
                             int64_t capacity) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  const long bytes = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  const int64_t total = bytes;
  const int64_t n = total < capacity ? total : capacity;

  std::vector<uint8_t> raw(n);
  if (n > 0 && std::fread(raw.data(), 1, n, f) != (size_t)n) {
    std::fclose(f);
    return -1;
  }
  std::fclose(f);
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t v = raw[i];
    out[i] = (v < lut_len) ? (int32_t)lut[v] : 0;
  }
  return n;
}

// One-shot sample load: lidar + labels + fixed-capacity pack.
// Fills points (capacity*4 f32, zero-padded), labels (capacity i32,
// 0-padded), point_valid (capacity u8: real slot), mask (capacity u8:
// real AND label != ignore_index — reference dataloader.py:236-239).
// label_path may be NULL/empty (labels all 0). Returns n points or -1.
int64_t tpu3dssf_load_sample(const char* lidar_path,
                             const char* label_path, const uint8_t* lut,
                             int64_t lut_len, int64_t capacity,
                             int32_t ignore_index, float* points,
                             int32_t* labels, uint8_t* point_valid,
                             uint8_t* mask) {
  std::memset(points, 0, capacity * 4 * sizeof(float));
  std::memset(labels, 0, capacity * sizeof(int32_t));
  std::memset(point_valid, 0, capacity);
  std::memset(mask, 0, capacity);

  const int64_t n = tpu3dssf_read_lidar_bin(lidar_path, points, capacity);
  if (n < 0) return -1;

  if (label_path && label_path[0] != '\0') {
    const int64_t m = tpu3dssf_read_labels(label_path, lut, lut_len,
                                           labels, capacity);
    if (m < 0) return -1;
  }
  for (int64_t i = 0; i < n; ++i) {
    point_valid[i] = 1;
    mask[i] = labels[i] != ignore_index;
  }
  return n;
}

}  // extern "C"
