#include <atomic>
#include <cstdint>
#include <cstdlib>
static std::atomic<uint64_t> ctr{0};
static uint64_t seed_base() {
  static uint64_t s = [] {
    const char *e = getenv("CLOVER_SR_SEED");
    return e ? strtoull(e, nullptr, 10) : 0x12345678ULL;
  }();
  return s;
}
static uint64_t splitmix64(uint64_t x) {
  x += 0x9E3779B97F4A7C15ULL;
  x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ULL;
  x = (x ^ (x >> 27)) * 0x94D049BB133111EBULL;
  return x ^ (x >> 31);
}
extern "C" int clover_soft_rdrand64(unsigned long long *p) {
  *p = splitmix64((seed_base() << 20) + ctr.fetch_add(1) + 1);
  return 1;
}
extern "C" int clover_soft_rdrand32(unsigned int *p) {
  unsigned long long v; clover_soft_rdrand64(&v);
  *p = (unsigned int)v; return 1;
}
