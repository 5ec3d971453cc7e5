/*
 * Minimal fftw3f-compatible shim so the C reference can be built as a
 * differential test oracle in an image without FFTW. Implements exactly
 * the 8 entry points the reference uses (power-of-two complex transforms,
 * unnormalized in both directions, float32).
 *
 * This is original code (iterative radix-2 Cooley-Tukey), not FFTW.
 */
#ifndef FFTW_SHIM_H
#define FFTW_SHIM_H

#include <complex.h>
#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef float fftwf_complex[2];
typedef struct fftwf_plan_s *fftwf_plan;

#define FFTW_FORWARD  (-1)
#define FFTW_BACKWARD (+1)
#define FFTW_MEASURE   0
#define FFTW_ESTIMATE  64

fftwf_plan fftwf_plan_dft_1d(int n, float complex *in, float complex *out,
                             int sign, unsigned flags);
void fftwf_execute(fftwf_plan p);
void fftwf_destroy_plan(fftwf_plan p);
float complex *fftwf_alloc_complex(size_t n);
void fftwf_free(void *p);
int fftwf_import_wisdom_from_filename(const char *fn);
int fftwf_export_wisdom_to_filename(const char *fn);

#ifdef __cplusplus
}
#endif

#endif
