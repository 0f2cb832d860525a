/* C consumer of libaec_tpu's compatibility ABI: encodes and decodes a
 * ramp through the libaec-compatible entry points of libaectpu.so.
 *
 * Build & run:
 *   gcc -I libaec_tpu/native examples/c_consumer.c \
 *       -L libaec_tpu/native -l:libaectpu.so -o /tmp/c_consumer
 *   LD_LIBRARY_PATH=libaec_tpu/native /tmp/c_consumer
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "libaec_compat.h"

int main(void) {
    enum { N = 1 << 16 };
    unsigned char *raw = malloc(2 * N), *comp = malloc(4 * N),
                  *back = malloc(2 * N);
    for (int i = 0; i < N; i++) {  /* 16-bit MSB ramp with texture */
        unsigned v = (i / 7) % 4096 + (i % 3);
        raw[2 * i] = (unsigned char)(v >> 8);
        raw[2 * i + 1] = (unsigned char)v;
    }

    struct aec_stream s = {0};
    s.bits_per_sample = 16;
    s.block_size = 64;
    s.rsi = 128;
    s.flags = AEC_DATA_MSB | AEC_DATA_PREPROCESS;
    s.next_in = raw;
    s.avail_in = 2 * N;
    s.next_out = comp;
    s.avail_out = 4 * N;
    if (aec_buffer_encode(&s) != AEC_OK) {
        fprintf(stderr, "encode failed\n");
        return 1;
    }
    size_t comp_len = s.total_out;

    struct aec_stream d = {0};
    d.bits_per_sample = 16;
    d.block_size = 64;
    d.rsi = 128;
    d.flags = AEC_DATA_MSB | AEC_DATA_PREPROCESS;
    d.next_in = comp;
    d.avail_in = comp_len;
    d.next_out = back;
    d.avail_out = 2 * N;
    if (aec_buffer_decode(&d) != AEC_OK || d.total_out != 2 * N ||
        memcmp(raw, back, 2 * N) != 0) {
        fprintf(stderr, "decode mismatch\n");
        return 1;
    }

    /* szlib surface */
    SZ_com_t p = {SZ_MSB_OPTION_MASK | SZ_NN_OPTION_MASK, 16, 16, 256};
    size_t dlen = 4 * N;
    if (SZ_BufftoBuffCompress(comp, &dlen, raw, 2 * N, &p) != SZ_OK) {
        fprintf(stderr, "SZ compress failed\n");
        return 1;
    }
    size_t blen = 2 * N;
    if (SZ_BufftoBuffDecompress(back, &blen, comp, dlen, &p) != SZ_OK ||
        blen != 2 * N || memcmp(raw, back, 2 * N) != 0) {
        fprintf(stderr, "SZ roundtrip mismatch\n");
        return 1;
    }

    printf("c_consumer: aec %zu->%zu bytes, sz %zu bytes, roundtrips OK\n",
           (size_t)(2 * N), comp_len, dlen);
    free(raw);
    free(comp);
    free(back);
    return 0;
}
