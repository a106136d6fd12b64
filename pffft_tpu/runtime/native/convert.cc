// Native sample-format converters: the host-side IO layer between SDR
// byte streams and the f32 planar arrays the TPU engine consumes.
//
// The reference's CIC DDC ingests s16-real, s16-complex-interleaved and
// u8-complex-interleaved sample formats directly in its C hot loop
// (/root/reference/src/pf_cic.cpp:87-252 cicddc_s16_c / _cs16_c / _cu8_c);
// PFFASTCONV's DIRECT_INP/DIRECT_OUT flags play the same
// avoid-the-copy role (/root/reference/include/pffft/pffastconv.h:104-118).
// Here the device wants planar float32, so the conversion (widen, scale,
// deinterleave) is a memory-bound host pass; these converters do it in
// one tight auto-vectorizable loop per format instead of a chain of
// numpy temporaries (astype + slicing = 3+ passes).
//
// Scales match the reference: s16 by 1/32768, u8 offset-binary (x-127.4)
// by 1/128 (pf_cic.cpp cu8 path subtracts the DC midpoint).

#include <cstdint>
#include <cstddef>

extern "C" {

// s16 real -> f32, scaled by 1/32768.
void pftpu_convert_s16_f32(const int16_t* in, float* out, uint64_t n) {
  const float k = 1.0f / 32768.0f;
  for (uint64_t i = 0; i < n; ++i) out[i] = (float)in[i] * k;
}

// s16 interleaved IQ -> planar (re, im) f32, scaled by 1/32768.
void pftpu_convert_cs16_planar_f32(const int16_t* in, float* re, float* im,
                                   uint64_t n_cplx) {
  const float k = 1.0f / 32768.0f;
  for (uint64_t i = 0; i < n_cplx; ++i) {
    re[i] = (float)in[2 * i] * k;
    im[i] = (float)in[2 * i + 1] * k;
  }
}

// u8 offset-binary interleaved IQ -> planar f32 in ~[-1, 1):
// (x - 127.4) / 128 (the reference's cu8 midpoint, pf_cic.cpp).
void pftpu_convert_cu8_planar_f32(const uint8_t* in, float* re, float* im,
                                  uint64_t n_cplx) {
  const float mid = 127.4f;
  const float k = 1.0f / 128.0f;
  for (uint64_t i = 0; i < n_cplx; ++i) {
    re[i] = ((float)in[2 * i] - mid) * k;
    im[i] = ((float)in[2 * i + 1] - mid) * k;
  }
}

// planar f32 -> s16 interleaved IQ with saturation, scale 32767.
void pftpu_convert_planar_f32_cs16(const float* re, const float* im,
                                   int16_t* out, uint64_t n_cplx) {
  for (uint64_t i = 0; i < n_cplx; ++i) {
    float a = re[i] * 32767.0f;
    float b = im[i] * 32767.0f;
    if (a > 32767.0f) a = 32767.0f;
    if (a < -32768.0f) a = -32768.0f;
    if (b > 32767.0f) b = 32767.0f;
    if (b < -32768.0f) b = -32768.0f;
    out[2 * i] = (int16_t)a;
    out[2 * i + 1] = (int16_t)b;
  }
}

}  // extern "C"
