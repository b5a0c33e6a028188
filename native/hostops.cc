// Native host-side data ops for the TPU DenseCLIP framework.
//
// The device path is JAX/XLA/Pallas; these C++ kernels cover the host data
// plane — the per-pixel passes that sit between PNG decode and device
// transfer.  The reference does these with numpy fancy indexing / masked
// writes in DataLoader worker processes (reference:
// segmentation/datasets/cityscapes.py:79-85 `map_labels_fast`,
// cityscapes_depth_seg.py:137-170 `disparity_to_depth`); a fused single-pass
// C++ loop avoids the 5+ temporaries numpy materializes per 2-megapixel
// frame and releases the GIL so loader threads scale.
//
// Build: `make -C native` (g++ -O3 -shared).  Python binding: ctypes
// (denseclip_vit_multimodal_tpu/data/_native.py) with a numpy fallback, so
// the framework runs unchanged where no toolchain exists.

#include <cstddef>
#include <cstdint>

extern "C" {

// labelId -> trainId remap through a lookup table; ids >= table_len map to
// `ignore`.  In/out may alias.
void remap_labels_u8(const uint8_t* in, uint8_t* out, size_t n,
                     const uint8_t* table, size_t table_len, uint8_t ignore) {
  // Expand to a full 256-entry LUT once so the hot loop is a single gather.
  uint8_t lut[256];
  for (size_t i = 0; i < 256; ++i) {
    lut[i] = (i < table_len) ? table[i] : ignore;
  }
  for (size_t i = 0; i < n; ++i) {
    out[i] = lut[in[i]];
  }
}

// Cityscapes disparity (uint16) -> metric depth (float32), fused:
//   scaled = (d - offset) / scale                     where d > 0
//   depth  = bf / (scaled + 1e-6)                     where scaled > min_scaled
//   valid  = d > 0 && depth <= depth_max; invalid -> ignore_value
// Returns the number of valid pixels.
size_t disparity_to_depth_f32(const uint16_t* disp, float* depth, size_t n,
                              float bf, float depth_max, float scale,
                              float offset, float min_scaled,
                              float ignore_value) {
  size_t valid_count = 0;
  for (size_t i = 0; i < n; ++i) {
    const uint16_t raw = disp[i];
    float out = ignore_value;
    if (raw > 0) {
      const float scaled = (static_cast<float>(raw) - offset) / scale;
      if (scaled > min_scaled) {
        const float d = bf / (scaled + 1e-6f);
        if (d <= depth_max) {
          out = d;
          ++valid_count;
        }
      }
    }
    depth[i] = out;
  }
  return valid_count;
}

// uint8 HWC image -> float32 CLIP-normalized, fused (x/255 - mean) / std.
// Used by host-side preprocessing paths that bypass the on-device augmenter
// (e.g. pure-host inference clients).
void normalize_u8_f32(const uint8_t* in, float* out, size_t n_pixels,
                      const float* mean, const float* inv_std) {
  const float k = 1.0f / 255.0f;
  for (size_t i = 0; i < n_pixels; ++i) {
    const size_t base = i * 3;
    out[base + 0] = (static_cast<float>(in[base + 0]) * k - mean[0]) * inv_std[0];
    out[base + 1] = (static_cast<float>(in[base + 1]) * k - mean[1]) * inv_std[1];
    out[base + 2] = (static_cast<float>(in[base + 2]) * k - mean[2]) * inv_std[2];
  }
}

}  // extern "C"
