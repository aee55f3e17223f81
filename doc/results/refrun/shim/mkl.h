/* Minimal MKL stub: correct single-threaded sgemv + somatcopy. */
#pragma once
#include <cstdio>
#include <cstddef>
typedef int MKL_INT;
enum CBLAS_LAYOUT { CblasRowMajor = 101, CblasColMajor = 102 };
enum CBLAS_TRANSPOSE { CblasNoTrans = 111, CblasTrans = 112 };
static inline void mkl_get_version_string(char *buf, int len) { snprintf(buf, len, "MKL-stub 0.0"); }
static inline void mkl_set_num_threads(int) {}
static inline void cblas_sgemv(CBLAS_LAYOUT, CBLAS_TRANSPOSE trans,
                               int m, int n, float alpha, const float *a, int lda,
                               const float *x, int incx, float beta, float *y, int incy) {
  if (trans == CblasNoTrans) {
    for (int i = 0; i < m; i++) {
      double acc = 0.0;
      for (int j = 0; j < n; j++) acc += (double)a[(size_t)i * lda + j] * x[(size_t)j * incx];
      y[(size_t)i * incy] = alpha * (float)acc + beta * y[(size_t)i * incy];
    }
  } else {
    for (int j = 0; j < n; j++) y[(size_t)j * incy] *= beta;
    for (int i = 0; i < m; i++)
      for (int j = 0; j < n; j++)
        y[(size_t)j * incy] += alpha * a[(size_t)i * lda + j] * x[(size_t)i * incx];
  }
}
static inline void mkl_somatcopy(char, char, size_t rows, size_t cols, float alpha,
                                 const float *a, size_t lda, float *b, size_t ldb) {
  for (size_t i = 0; i < rows; i++)
    for (size_t j = 0; j < cols; j++) b[j * ldb + i] = alpha * a[i * lda + j];
}
