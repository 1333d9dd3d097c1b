// pack4 — 8-bit -> 4-bit grayscale page packing at memcpy speed.
//
// The serving path uploads uint8 page stacks through a ~40 MB/s relay
// link; packing two pixels per byte halves the dominant per-page cost.
// numpy's uint8 shift/or ufuncs measure ~30 MB/s on this host's single
// core (100x slower than its 1.5 GB/s memcpy), so the inner loop lives
// here: rounding quantization to 16 levels, two pixels per output byte.
// The device unpacks with nibble*17 (exact inverse midpoints, max abs
// error 8/255).
//
// Counterpart in spirit to the reference's native accelerator shims
// (/root/reference/marie/lang/__init__.py jemalloc/TensorRT hooks): the
// hot host loop is native, the policy stays in Python.

#include <cstddef>
#include <cstdint>

extern "C" {

// src: n_pairs*2 bytes (contiguous), dst: n_pairs bytes
void pack4(const uint8_t* src, uint8_t* dst, size_t n_pairs) {
  // nibble = round(v / 17): the inverse of the device's nibble*17, so
  // reconstruction error is <= 8 across the whole range (a plain >>4
  // quantizes by 16 but reconstructs by 17 — error drifts to 23)
  for (size_t i = 0; i < n_pairs; i++) {
    uint32_t a = ((uint32_t)src[2 * i] + 8) / 17;
    uint32_t b = ((uint32_t)src[2 * i + 1] + 8) / 17;
    dst[i] = (uint8_t)((a << 4) | b);
  }
}

// unpack for host-side parity tests: dst[2i] = hi*17, dst[2i+1] = lo*17
void unpack4(const uint8_t* src, uint8_t* dst, size_t n_pairs) {
  for (size_t i = 0; i < n_pairs; i++) {
    dst[2 * i] = (uint8_t)((src[i] >> 4) * 17);
    dst[2 * i + 1] = (uint8_t)((src[i] & 0xF) * 17);
  }
}

}  // extern "C"

extern "C" {

// pack2 — 8-bit -> 2-bit (4 gray levels), four pixels per byte.
// level = round(v / 85) in 0..3; device reconstructs level * 85.
// Big-endian within the byte: pixel (4i) takes bits 7-6 ... pixel
// (4i+3) bits 1-0, matching the device unpack's (3 - col%4)*2 shift.
void pack2(const uint8_t* src, uint8_t* dst, size_t n_quads) {
  for (size_t i = 0; i < n_quads; i++) {
    uint32_t a = ((uint32_t)src[4 * i] + 42) / 85;
    uint32_t b = ((uint32_t)src[4 * i + 1] + 42) / 85;
    uint32_t c = ((uint32_t)src[4 * i + 2] + 42) / 85;
    uint32_t d = ((uint32_t)src[4 * i + 3] + 42) / 85;
    dst[i] = (uint8_t)((a << 6) | (b << 4) | (c << 2) | d);
  }
}

// host-side inverse for parity tests
void unpack2(const uint8_t* src, uint8_t* dst, size_t n_quads) {
  for (size_t i = 0; i < n_quads; i++) {
    dst[4 * i] = (uint8_t)(((src[i] >> 6) & 3) * 85);
    dst[4 * i + 1] = (uint8_t)(((src[i] >> 4) & 3) * 85);
    dst[4 * i + 2] = (uint8_t)(((src[i] >> 2) & 3) * 85);
    dst[4 * i + 3] = (uint8_t)((src[i] & 3) * 85);
  }
}

// pack1 — 8-bit -> 1-bit (binarized), eight pixels per byte.
// level = v >= 128; device reconstructs level * 255.  Big-endian
// within the byte: pixel (8i) takes bit 7 ... pixel (8i+7) bit 0,
// matching the device unpack's (7 - col%8) shift.
void pack1(const uint8_t* src, uint8_t* dst, size_t n_octets) {
  for (size_t i = 0; i < n_octets; i++) {
    uint32_t v = 0;
    for (int j = 0; j < 8; j++) {
      v = (v << 1) | (src[8 * i + j] >= 128 ? 1u : 0u);
    }
    dst[i] = (uint8_t)v;
  }
}

// host-side inverse for parity tests
void unpack1(const uint8_t* src, uint8_t* dst, size_t n_octets) {
  for (size_t i = 0; i < n_octets; i++) {
    for (int j = 0; j < 8; j++) {
      dst[8 * i + j] = (uint8_t)(((src[i] >> (7 - j)) & 1) * 255);
    }
  }
}

// pack1d — 8-bit -> 1-bit with ORDERED (8x8 Bayer) dithering.
// bit = v > bayer_threshold[row%8, col%8]; gray survives as spatial bit
// density (the device-side bilinear crop resampling averages it back).
// Same big-endian-in-byte wire layout as pack1.  Thresholds are
// (bayer_index * 4 + 1), matching marie_tpu/utils/pack4.py _BAYER8_T.
static const uint8_t kBayerT[8][8] = {
    {1, 129, 33, 161, 9, 137, 41, 169},
    {193, 65, 225, 97, 201, 73, 233, 105},
    {49, 177, 17, 145, 57, 185, 25, 153},
    {241, 113, 209, 81, 249, 121, 217, 89},
    {13, 141, 45, 173, 5, 133, 37, 165},
    {205, 77, 237, 109, 197, 69, 229, 101},
    {61, 189, 29, 157, 53, 181, 21, 149},
    {253, 125, 221, 93, 245, 117, 213, 85},
};

void pack1d(const uint8_t* src, uint8_t* dst, size_t n_pages, size_t h,
            size_t w) {
  size_t w8 = w / 8;
  for (size_t p = 0; p < n_pages; p++) {
    for (size_t r = 0; r < h; r++) {
      const uint8_t* row = src + (p * h + r) * w;
      uint8_t* out = dst + (p * h + r) * w8;
      const uint8_t* t = kBayerT[r & 7];
      for (size_t c = 0; c < w8; c++) {
        uint32_t v = 0;
        for (int j = 0; j < 8; j++) {
          v = (v << 1) | (row[8 * c + j] > t[j] ? 1u : 0u);
        }
        out[c] = (uint8_t)v;
      }
    }
  }
}

}  // extern "C"
