/* fftw3f shim: double-precision iterative radix-2 with Bluestein for
 * arbitrary n.  Slow but exact enough for the parity experiment. */
#include <stdlib.h>
#include <string.h>
#include <math.h>
#include "fftw3.h"

struct fftwf_plan_s { int n; int sign; };

static void fft_pow2(double *re, double *im, int n, int sign)
{
    int i, j, len;
    /* bit reversal */
    for (i = 1, j = 0; i < n; i++) {
        int bit = n >> 1;
        for (; j & bit; bit >>= 1) j ^= bit;
        j ^= bit;
        if (i < j) {
            double t = re[i]; re[i] = re[j]; re[j] = t;
            t = im[i]; im[i] = im[j]; im[j] = t;
        }
    }
    for (len = 2; len <= n; len <<= 1) {
        double ang = sign * 2.0 * M_PI / len;
        double wr = cos(ang), wi = sin(ang);
        for (i = 0; i < n; i += len) {
            double cr = 1.0, ci = 0.0;
            for (j = 0; j < len / 2; j++) {
                int a = i + j, b = i + j + len / 2;
                double ur = re[a], ui = im[a];
                double vr = re[b] * cr - im[b] * ci;
                double vi = re[b] * ci + im[b] * cr;
                re[a] = ur + vr; im[a] = ui + vi;
                re[b] = ur - vr; im[b] = ui - vi;
                double ncr = cr * wr - ci * wi;
                ci = cr * wi + ci * wr; cr = ncr;
            }
        }
    }
}

static int next_pow2(int n) { int p = 1; while (p < n) p <<= 1; return p; }

/* Bluestein for arbitrary n (no normalization; matches FFTW) */
static void fft_any(double *re, double *im, int n, int sign)
{
    if ((n & (n - 1)) == 0) { fft_pow2(re, im, n, sign); return; }
    int m = next_pow2(2 * n - 1);
    double *ar = calloc(m, sizeof(double)), *ai = calloc(m, sizeof(double));
    double *br = calloc(m, sizeof(double)), *bi = calloc(m, sizeof(double));
    double *cr = calloc(n, sizeof(double)), *ci = calloc(n, sizeof(double));
    int k;
    for (k = 0; k < n; k++) {
        double ang = sign * M_PI * fmod((double)k * (double)k, 2.0 * n) / n;
        cr[k] = cos(ang); ci[k] = sin(ang);
        ar[k] = re[k] * cr[k] - im[k] * ci[k];
        ai[k] = re[k] * ci[k] + im[k] * cr[k];
        br[k] = cr[k]; bi[k] = -ci[k];
        if (k) { br[m - k] = cr[k]; bi[m - k] = -ci[k]; }
    }
    fft_pow2(ar, ai, m, -1);
    fft_pow2(br, bi, m, -1);
    for (k = 0; k < m; k++) {
        double tr = ar[k] * br[k] - ai[k] * bi[k];
        ai[k] = ar[k] * bi[k] + ai[k] * br[k];
        ar[k] = tr;
    }
    fft_pow2(ar, ai, m, +1);
    for (k = 0; k < n; k++) {          /* /m for inverse, then chirp */
        double rr = ar[k] / m, ri = ai[k] / m;
        re[k] = rr * cr[k] - ri * ci[k];
        im[k] = rr * ci[k] + ri * cr[k];
    }
    free(ar); free(ai); free(br); free(bi); free(cr); free(ci);
}

fftwf_plan fftwf_plan_dft_1d(int n, fftwf_complex *in, fftwf_complex *out,
                             int sign, unsigned flags)
{
    (void)in; (void)out; (void)flags;
    struct fftwf_plan_s *p = malloc(sizeof(*p));
    p->n = n; p->sign = sign;
    return p;
}

void fftwf_execute_dft(const fftwf_plan p, fftwf_complex *in,
                       fftwf_complex *out)
{
    int n = p->n, k;
    double *re = malloc(n * sizeof(double));
    double *im = malloc(n * sizeof(double));
    for (k = 0; k < n; k++) { re[k] = in[k][0]; im[k] = in[k][1]; }
    fft_any(re, im, n, p->sign);
    for (k = 0; k < n; k++) { out[k][0] = (float)re[k];
                              out[k][1] = (float)im[k]; }
    free(re); free(im);
}

void fftwf_destroy_plan(fftwf_plan p) { free(p); }
void *fftwf_malloc(size_t n) { return malloc(n); }
void fftwf_free(void *p) { free(p); }
int fftwf_init_threads(void) { return 1; }
void fftwf_plan_with_nthreads(int n) { (void)n; }
