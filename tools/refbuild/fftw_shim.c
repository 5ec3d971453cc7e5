/* Minimal fftw3f shim: iterative radix-2 complex FFT (float32,
 * unnormalized, in/out pointers bound at plan time like FFTW). */

#include <math.h>
#include <stdlib.h>
#include <string.h>

#include "fftw3.h"

struct fftwf_plan_s {
    int n;
    int sign;                 /* -1 fwd, +1 bwd */
    float complex *in;
    float complex *out;
    float complex *tw;        /* n/2 twiddles for the chosen direction */
    int *rev;                 /* bit-reversal permutation */
};

static int ilog2(int n) {
    int k = 0;
    while ((1 << k) < n) k++;
    return k;
}

fftwf_plan fftwf_plan_dft_1d(int n, float complex *in, float complex *out,
                             int sign, unsigned flags) {
    (void)flags;
    if (n <= 0 || (n & (n - 1)) != 0) return NULL;   /* pow2 only */
    fftwf_plan p = malloc(sizeof(*p));
    p->n = n;
    p->sign = sign;
    p->in = in;
    p->out = out;
    p->tw = malloc(sizeof(float complex) * (n / 2));
    for (int k = 0; k < n / 2; k++) {
        double a = (double)sign * 2.0 * M_PI * k / n;
        p->tw[k] = (float)cos(a) + (float)sin(a) * I;
    }
    int bits = ilog2(n);
    p->rev = malloc(sizeof(int) * n);
    for (int i = 0; i < n; i++) {
        int r = 0;
        for (int b = 0; b < bits; b++)
            r |= ((i >> b) & 1) << (bits - 1 - b);
        p->rev[i] = r;
    }
    return p;
}

void fftwf_execute(fftwf_plan p) {
    int n = p->n;
    float complex *out = p->out;
    const float complex *in = p->in;
    if (in == out) {
        /* in-place: permute via scratch */
        float complex *tmp = malloc(sizeof(float complex) * n);
        for (int i = 0; i < n; i++) tmp[p->rev[i]] = in[i];
        memcpy(out, tmp, sizeof(float complex) * n);
        free(tmp);
    } else {
        for (int i = 0; i < n; i++) out[p->rev[i]] = in[i];
    }
    for (int len = 2; len <= n; len <<= 1) {
        int half = len >> 1;
        int step = n / len;
        for (int i = 0; i < n; i += len) {
            for (int j = 0; j < half; j++) {
                float complex w = p->tw[j * step];
                float complex u = out[i + j];
                float complex v = out[i + j + half] * w;
                out[i + j] = u + v;
                out[i + j + half] = u - v;
            }
        }
    }
}

void fftwf_destroy_plan(fftwf_plan p) {
    if (!p) return;
    free(p->tw);
    free(p->rev);
    free(p);
}

float complex *fftwf_alloc_complex(size_t n) {
    return aligned_alloc(32, ((n * sizeof(float complex) + 31) / 32) * 32);
}

void fftwf_free(void *p) { free(p); }

int fftwf_import_wisdom_from_filename(const char *fn) { (void)fn; return 0; }
int fftwf_export_wisdom_to_filename(const char *fn) { (void)fn; return 1; }
