/* Fast generator for the benchmarks/synth.py hash matrix: writes the
 * npad x npad u8 symmetric distance matrix (rows/cols >= n zeroed,
 * zero diagonal) to a file at memory/disk speed.  The numpy
 * formulation streams ~8 full-matrix temporaries through 2 cores and
 * takes hours at n=200k; this writes the same bytes in minutes.
 *
 * Cell hash (must match synth.cell_hash_np exactly):
 *   h = max(i,j)*2654435761 + min(i,j)*40503   (u32 wraparound)
 *   h ^= h >> 15;  h *= 2246822519;  h ^= h >> 13
 *   v = h % mod + lo   (0 on the diagonal / padding)
 *
 * Metric mode (7th arg "metric", must match synth.cell_metric_np):
 * coordinate d of point k is a hash of (k >> d, d); cells are the L1
 * distance over the 8 levels, scaled to 3..255 (0 diagonal/padding).
 * Per-level coordinate arrays are precomputed once (8 * npad bytes),
 * so the per-cell cost stays ~8 adds.
 *
 * Usage: synth_gen FILE n npad mod lo nthreads [hash|metric]
 */
#define _GNU_SOURCE
#include <fcntl.h>
#include <pthread.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <unistd.h>

static uint32_t N, NPAD, MOD, LO;
static int FD, METRIC;
static int32_t *COORD[8]; /* per-level coordinates, [d][j] */

static int32_t hcoord(uint32_t x, uint32_t d) {
    uint32_t h = x * 2654435761u + d * 40503u + 2246822519u;
    h ^= h >> 15;
    h *= 2246822519u;
    h ^= h >> 13;
    return (int32_t)((h >> 7) & 0xFFu);
}

static void *worker(void *arg) {
    long t = (long)(intptr_t)arg;
    long tid = t & 0xffff, nthr = t >> 16;
    uint8_t *row = malloc(NPAD);
    for (uint32_t i = tid; i < NPAD; i += nthr) {
        if (i >= N) {
            memset(row, 0, NPAD);
        } else if (METRIC) {
            int32_t ci[8];
            for (uint32_t d = 0; d < 8; ++d)
                ci[d] = COORD[d][i];
            for (uint32_t j = 0; j < N; ++j) {
                int32_t acc = 0;
                for (uint32_t d = 0; d < 8; ++d) {
                    int32_t df = ci[d] - COORD[d][j];
                    acc += df < 0 ? -df : df;
                }
                int32_t v = 3 + (acc >> 3);
                row[j] = (uint8_t)(v > 255 ? 255 : v);
            }
            row[i] = 0;
            if (NPAD > N) memset(row + N, 0, NPAD - N);
        } else {
            for (uint32_t j = 0; j < N; ++j) {
                uint32_t hi = i > j ? i : j, lo = i > j ? j : i;
                uint32_t h = hi * 2654435761u + lo * 40503u;
                h ^= h >> 15;
                h *= 2246822519u;
                h ^= h >> 13;
                row[j] = (uint8_t)(h % MOD + LO);
            }
            row[i] = 0;
            if (NPAD > N) memset(row + N, 0, NPAD - N);
        }
        if (pwrite(FD, row, NPAD, (off_t)i * NPAD) != (ssize_t)NPAD) {
            perror("pwrite");
            exit(1);
        }
    }
    free(row);
    return NULL;
}

int main(int argc, char **argv) {
    if (argc != 7 && argc != 8) {
        fprintf(stderr,
                "usage: %s FILE n npad mod lo nthreads [hash|metric]\n",
                argv[0]);
        return 2;
    }
    N = (uint32_t)strtoul(argv[2], 0, 10);
    NPAD = (uint32_t)strtoul(argv[3], 0, 10);
    MOD = (uint32_t)strtoul(argv[4], 0, 10);
    LO = (uint32_t)strtoul(argv[5], 0, 10);
    long nthr = strtol(argv[6], 0, 10);
    METRIC = argc > 7 && strcmp(argv[7], "metric") == 0;
    if (METRIC) {
        for (uint32_t d = 0; d < 8; ++d) {
            COORD[d] = malloc(NPAD * sizeof(int32_t));
            for (uint32_t j = 0; j < NPAD; ++j)
                COORD[d][j] = hcoord(j >> d, d);
        }
    }
    FD = open(argv[1], O_WRONLY | O_CREAT, 0644);
    if (FD < 0) {
        perror("open");
        return 1;
    }
    if (ftruncate(FD, (off_t)NPAD * NPAD) != 0) {
        perror("ftruncate");
        return 1;
    }
    pthread_t th[64];
    if (nthr > 64) nthr = 64;
    for (long t = 1; t < nthr; ++t)
        pthread_create(&th[t], 0, worker,
                       (void *)(intptr_t)(t | (nthr << 16)));
    worker((void *)(intptr_t)(0 | (nthr << 16)));
    for (long t = 1; t < nthr; ++t) pthread_join(th[t], 0);
    close(FD);
    return 0;
}
