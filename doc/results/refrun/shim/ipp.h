/* Minimal IPP stub: just enough to compile Clover's headers and provide a
   correct float/byte transpose. */
#pragma once
#include <cstdint>
typedef int IppStatus;
#define ippStsNoErr 0
typedef struct { const char *Name, *Version; } IppLibraryVersion;
typedef unsigned long long Ipp64u;
typedef unsigned char Ipp8u;
typedef unsigned short Ipp16u;
typedef float Ipp32f;
typedef struct { int width, height; } IppiSize;
enum {
  ippCPUID_MMX=1<<0, ippCPUID_SSE=1<<1, ippCPUID_SSE2=1<<2, ippCPUID_SSE3=1<<3,
  ippCPUID_SSSE3=1<<4, ippCPUID_MOVBE=1<<5, ippCPUID_SSE41=1<<6,
  ippCPUID_SSE42=1<<7, ippCPUID_AVX=1<<8, ippAVX_ENABLEDBYOS=1<<9,
  ippCPUID_AES=1<<10, ippCPUID_CLMUL=1<<11, ippCPUID_SHA=1<<12,
  ippCPUID_AVX2=1<<13, ippCPUID_ADCOX=1<<14, ippCPUID_RDRAND=1<<15,
  ippCPUID_RDSEED=1<<16, ippCPUID_PREFETCHW=1<<17, ippCPUID_KNC=1<<18,
  ippCPUID_AVX512F=1<<19, ippCPUID_AVX512CD=1<<20, ippCPUID_AVX512ER=1<<21,
  ippCPUID_F16C=1<<22,
};
static inline int ippSetNumThreads(int) { return 0; }
static inline IppStatus ippInit() { return ippStsNoErr; }
static inline const IppLibraryVersion *ippGetLibVersion() {
  static IppLibraryVersion v = {"IPP-stub", "0.0"}; return &v;
}
static inline IppStatus ippGetCpuFeatures(Ipp64u *mask, void *) { *mask = 0; return ippStsNoErr; }
static inline Ipp64u ippGetEnabledCpuFeatures() { return 0; }
static inline IppStatus ippiTranspose_32f_C1R(const Ipp32f *src, int srcStep,
                                              Ipp32f *dst, int dstStep, IppiSize roi) {
  const int w = roi.width, h = roi.height;   /* src: h rows x w cols */
  const int ss = srcStep / 4, ds = dstStep / 4;
  for (int i = 0; i < h; i++)
    for (int j = 0; j < w; j++) dst[j * ds + i] = src[i * ss + j];
  return ippStsNoErr;
}
static inline IppStatus ippiTranspose_8u_C1R(const Ipp8u *src, int srcStep,
                                             Ipp8u *dst, int dstStep, IppiSize roi) {
  const int w = roi.width, h = roi.height;
  for (int i = 0; i < h; i++)
    for (int j = 0; j < w; j++) dst[j * dstStep + i] = src[i * srcStep + j];
  return ippStsNoErr;
}
static inline IppStatus ippiTranspose_16u_C1R(const Ipp16u *src, int srcStep,
                                              Ipp16u *dst, int dstStep, IppiSize roi) {
  const int w = roi.width, h = roi.height;
  const int ss = srcStep / 2, ds = dstStep / 2;
  for (int i = 0; i < h; i++)
    for (int j = 0; j < w; j++) dst[j * ds + i] = src[i * ss + j];
  return ippStsNoErr;
}
