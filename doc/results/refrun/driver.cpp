/* Drive the reference's IHT or GD accuracy protocol (test_iht/test_gd
   semantics, test/accuracy/00_accuracy.cpp:36-128) for one config at
   one mu, with SR container keys drawn from the soft-RDRAND controlled
   by $CLOVER_SR_SEED.
   Usage: ./refiht <48|4|8|16|32> <mu> [dump <file> | load <file>]
          ./refiht gd<48|4|8|16|32> <mu> [dump <file> | load <file>]
   dump: write Phi,x,y (f32 raw: m*n, n, m) after reference data init.
   load: read them instead of generating.
   GD protocol (00_accuracy.cpp:93-128): m=384, n=256, 500 iterations,
   mu=0.4000000358. */
#include <cstdlib>
#include <cstring>
#include <cstdio>
#include <iostream>
#include <CloverMatrix4.h>
#include <CloverMatrix8.h>
#include <CloverMatrix16.h>
#include <CloverVector16.h>
#include <CloverVector4.h>
#include <CloverVector8.h>
#include "/root/reference/test/accuracy/02_iht_accuracy.h"
#include "/root/reference/test/accuracy/03_gd_accuracy.h"

void initialize_random_IHT_values(CloverVector32 &, CloverMatrix32 &,
                                  CloverVector32 &, uint64_t &);
void initialize_random_GD_values(CloverVector32 &, CloverMatrix32 &,
                                 CloverVector32 &);

int main(int argc, char **argv) {
  init_deterministic_keys();
  const char *cfg = argc > 1 ? argv[1] : "48";
  bool is_gd = !strncmp(cfg, "gd", 2);
  if (is_gd) cfg += 2;
  uint64_t m = is_gd ? 384 : 512, n = is_gd ? 256 : 1024;
  uint64_t epochs = is_gd ? 500 : 200, K = n / 16;
  CloverMatrix32 Phi(m, n);
  CloverVector32 x(n), y(m);
  float mu = argc > 2 ? (float)atof(argv[2])
                      : (is_gd ? 0.4000000358f : 0.0051299492f);
  const char *op = argc > 4 ? argv[3] : "";
  if (!strcmp(op, "load")) {
    FILE *f = fopen(argv[4], "rb");
    if (!f || fread(Phi.getData(), 4, m * n, f) != m * n ||
        fread(x.getData(), 4, n, f) != n ||
        fread(y.getData(), 4, m, f) != m) { fprintf(stderr, "load failed\n"); return 1; }
    fclose(f);
  } else {
    if (is_gd) initialize_random_GD_values(x, Phi, y);
    else initialize_random_IHT_values(x, Phi, y, K);
    if (!strcmp(op, "dump")) {
      FILE *f = fopen(argv[4], "wb");
      fwrite(Phi.getData(), 4, m * n, f);
      fwrite(x.getData(), 4, n, f);
      fwrite(y.getData(), 4, m, f);
      fclose(f);
      return 0;
    }
  }
  std::cout << "config=" << (is_gd ? "gd" : "") << cfg << " mu=" << mu
            << " K=" << K << std::endl;
  if (is_gd) {
    if (!strcmp(cfg, "48"))
      test_gd_accuracy<CloverMatrix4, CloverVector8>(x, Phi, y, epochs, mu);
    else if (!strcmp(cfg, "4"))
      test_gd_accuracy<CloverMatrix4, CloverVector4>(x, Phi, y, epochs, mu);
    else if (!strcmp(cfg, "8"))
      test_gd_accuracy<CloverMatrix8, CloverVector8>(x, Phi, y, epochs, mu);
    else if (!strcmp(cfg, "16"))
      test_gd_accuracy<CloverMatrix16, CloverVector16>(x, Phi, y, epochs, mu);
    else if (!strcmp(cfg, "32"))
      test_gd_accuracy<CloverMatrix32, CloverVector32>(x, Phi, y, epochs, mu);
    return 0;
  }
  if (!strcmp(cfg, "48"))
    test_iht_accuracy<CloverMatrix4, CloverVector8>(x, Phi, y, epochs, K, mu);
  else if (!strcmp(cfg, "4"))
    test_iht_accuracy<CloverMatrix4, CloverVector4>(x, Phi, y, epochs, K, mu);
  else if (!strcmp(cfg, "8"))
    test_iht_accuracy<CloverMatrix8, CloverVector8>(x, Phi, y, epochs, K, mu);
  else if (!strcmp(cfg, "16"))
    test_iht_accuracy<CloverMatrix16, CloverVector16>(x, Phi, y, epochs, K, mu);
  else if (!strcmp(cfg, "32"))
    test_iht_accuracy<CloverMatrix32, CloverVector32>(x, Phi, y, epochs, K, mu);
  return 0;
}
