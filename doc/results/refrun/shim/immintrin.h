/* Shadow immintrin.h: pass through to the real header, then reroute the
   RDRAND intrinsics (this CPU has no RDRAND) to a seeded soft generator
   controlled by $CLOVER_SR_SEED so SR streams are reproducible. */
#pragma once
#include_next <immintrin.h>
#ifdef __cplusplus
extern "C" {
#endif
int clover_soft_rdrand64(unsigned long long *p);
int clover_soft_rdrand32(unsigned int *p);
#ifdef __cplusplus
}
#endif
#define _rdrand64_step(p) clover_soft_rdrand64(p)
#define _rdrand32_step(p) clover_soft_rdrand32(p)
