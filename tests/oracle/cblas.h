/* Minimal cblas_sgemm shim so the reference binary can be built as a test
 * oracle on machines without OpenBLAS.  Naive loops; the reference model is
 * 32x32 so speed is irrelevant for tests.  This header is OUR code, used only
 * when compiling the (read-only, unmodified) reference sources in /tmp. */
#pragma once
#include <cstddef>

enum CBLAS_ORDER { CblasRowMajor = 101, CblasColMajor = 102 };
enum CBLAS_TRANSPOSE { CblasNoTrans = 111, CblasTrans = 112 };

inline void cblas_sgemm(CBLAS_ORDER order, CBLAS_TRANSPOSE ta, CBLAS_TRANSPOSE tb,
                        int m, int n, int k, float alpha, const float *A, int lda,
                        const float *B, int ldb, float beta, float *C, int ldc) {
    (void)order; /* reference always uses CblasRowMajor */
    for (int i = 0; i < m; ++i) {
        for (int j = 0; j < n; ++j) {
            float acc = 0.0f;
            for (int p = 0; p < k; ++p) {
                float a = (ta == CblasNoTrans) ? A[i * lda + p] : A[p * lda + i];
                float b = (tb == CblasNoTrans) ? B[p * ldb + j] : B[j * ldb + p];
                acc += a * b;
            }
            C[i * ldc + j] = alpha * acc + beta * C[i * ldc + j];
        }
    }
}
