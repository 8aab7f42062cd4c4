/* Parity-anchor driver: runs the REFERENCE's own estimator code
 * (compiled unmodified from /root/reference/main.c + utils.c via the
 * stub mpi.h/omp.h in ./stub) on the shipped inputs.h dataset and prints
 * every H_EST vector in full-precision hex floats.
 *
 * The reference's main() only has PS-Linear enabled (main.c:37-54 comments
 * the rest out); rather than patching a copy of main.c, we rename its main
 * with -Dmain=reference_main_unused and drive all five estimator functions
 * from here.  This file contains NO reference code — it only *calls* the
 * reference's functions (declared below, defined in main.c:66-212) on the
 * reference's data (defined in inputs.h, declared extern here).
 *
 * Output format (stdout), parsed by capture_golden.py:
 *   EST <name>
 *   <i> <re-hex> <im-hex>     # one line per subcarrier, %La hex floats
 */
#include <complex.h>
#include <math.h>
#include <stdio.h>

#define SAMPUTIL 53

typedef long double complex lcplx;

/* data tables defined in the reference's inputs.h (included by main.c) */
extern lcplx tx_preamble_fft[SAMPUTIL];
extern lcplx rx_preamble_fft[SAMPUTIL];
extern lcplx tx_symb[SAMPUTIL * 15];
extern lcplx rx_symb[SAMPUTIL * 15];
extern double OW2;

/* estimators defined in the reference's main.c:66-212 */
void WiFi_channel_estimation_LT_LS(lcplx tx_pre[], lcplx rx_pre[], lcplx H_EST[]);
void WiFi_channel_estimation_PS_Linear(lcplx tx[], lcplx rx[], lcplx H_EST[]);
void WiFi_channel_estimation_PS_Cubic(lcplx tx[], lcplx rx[], lcplx H_EST[]);
void WiFi_channel_estimation_PS_Sinc(lcplx tx[], lcplx rx[], lcplx H_EST[]);
void WiFi_channel_estimation_PS_MMSE(lcplx tx[], lcplx rx[], lcplx **F,
                                     double ow2, lcplx H_EST_LS[], lcplx H_EST[]);

static void dump(const char *name, const lcplx *h) {
    printf("EST %s\n", name);
    for (int i = 0; i < SAMPUTIL; i++)
        printf("%d %La %La\n", i, creall(h[i]), cimagl(h[i]));
}

int main(int argc, char **argv) {
    /* which OFDM block to slice (reference hardcodes 0, main.c:16) */
    int block = (argc > 1) ? atoi(argv[1]) : 0;

    /* the 53x53 DFT matrix exactly as the reference driver builds it
     * (main.c:22-26: F[t][f] = exp(-2*pi*i*t*f/53), row-pointer layout) */
    static lcplx fstore[SAMPUTIL][SAMPUTIL];
    lcplx *F[SAMPUTIL];
    for (int t = 0; t < SAMPUTIL; t++) {
        F[t] = fstore[t];
        for (int f = 0; f < SAMPUTIL; f++)
            F[t][f] = cexpl(-2 * I * (long double)M_PI * t * f / SAMPUTIL);
    }

    lcplx tx_vec[SAMPUTIL], rx_vec[SAMPUTIL];
    for (int r = 0; r < SAMPUTIL; r++) {
        tx_vec[r] = tx_symb[SAMPUTIL * block + r];
        rx_vec[r] = rx_symb[SAMPUTIL * block + r];
    }

    lcplx h_lt[SAMPUTIL], h_lin[SAMPUTIL], h_cub[SAMPUTIL], h_sin[SAMPUTIL],
        h_mmse[SAMPUTIL];

    WiFi_channel_estimation_LT_LS(tx_preamble_fft, rx_preamble_fft, h_lt);
    WiFi_channel_estimation_PS_Linear(tx_vec, rx_vec, h_lin);
    WiFi_channel_estimation_PS_Cubic(tx_vec, rx_vec, h_cub);
    WiFi_channel_estimation_PS_Sinc(tx_vec, rx_vec, h_sin);
    WiFi_channel_estimation_PS_MMSE(tx_vec, rx_vec, F, OW2, h_lt, h_mmse);

    printf("BLOCK %d\n", block);
    dump("lt_ls", h_lt);
    dump("ps_linear", h_lin);
    dump("ps_cubic", h_cub);
    dump("ps_sinc", h_sin);
    dump("ps_mmse", h_mmse);
    return 0;
}
