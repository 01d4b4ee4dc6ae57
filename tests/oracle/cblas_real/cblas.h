/* Declaration-only cblas.h used when linking a real OpenBLAS .so (no dev
 * headers installed).  Matches the CBLAS ABI for the one entry point the
 * reference uses. */
#pragma once

enum CBLAS_ORDER { CblasRowMajor = 101, CblasColMajor = 102 };
enum CBLAS_TRANSPOSE { CblasNoTrans = 111, CblasTrans = 112 };

extern "C" void cblas_sgemm(CBLAS_ORDER order, CBLAS_TRANSPOSE ta,
                            CBLAS_TRANSPOSE tb, int m, int n, int k,
                            float alpha, const float *A, int lda,
                            const float *B, int ldb, float beta, float *C,
                            int ldc);
