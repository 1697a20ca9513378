// Native frame-codec core: int16 delta quantization for the recording
// pipeline (spatialsim_tpu/io/codec.py).
//
// The background compressor quantizes float32 position/color deltas to
// int16 (scale x1000) before zstd — at 1M bodies that is 12 MB of
// round-trip per frame on the host thread.  This TU provides the
// quantize/reconstruct loops as tight SIMD-izable kernels so the Python
// thread spends its time in zstd, not in numpy temporaries.  Loaded via
// ctypes (spatialsim_tpu/io/_native.py); numpy is the fallback.
//
// Built from source on first use into a gitignored build dir (no binary
// is committed); see _native.py.

#include <cstdint>
#include <cmath>

extern "C" {

// out[i] = round((cur[i] - prev[i]) * scale), saturated to int16.
// Returns the number of saturated elements so the caller can fall back
// to an absolute frame instead of silently corrupting the delta chain.
int64_t delta_encode_i16(const float* cur, const float* prev, int16_t* out,
                         int64_t n, float scale) {
    int64_t saturated = 0;
    for (int64_t i = 0; i < n; ++i) {
        float d = (cur[i] - prev[i]) * scale;
        if (d < -32768.f) { d = -32768.f; ++saturated; }
        else if (d > 32767.f) { d = 32767.f; ++saturated; }
        out[i] = (int16_t)lrintf(d);
    }
    return saturated;
}

// out[i] = prev[i] + delta[i] * inv_scale.
void delta_decode_f32(const int16_t* delta, const float* prev, float* out,
                      int64_t n, float inv_scale) {
    for (int64_t i = 0; i < n; ++i) {
        out[i] = prev[i] + (float)delta[i] * inv_scale;
    }
}

// Absolute-frame f32 -> f32 passthrough copy (kept for symmetry and so
// the Python layer can route every payload through one entry point).
void copy_f32(const float* src, float* dst, int64_t n) {
    for (int64_t i = 0; i < n; ++i) dst[i] = src[i];
}

int codec_abi_version() { return 2; }

}  // extern "C"
