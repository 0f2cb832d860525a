// ThreadSanitizer harness for the native runtime's threaded paths
// (round-3 review item: the scan-fill worker pool and the parallel-decode
// worker pool use hand-rolled atomics; this drives both under TSAN).
//
// Build + run (tools/tsan_check.sh):
//   g++ -O1 -g -fsanitize=thread -std=c++17 tools/tsan_check.cpp \
//       libaec_tpu/native/aectpu_native.cpp -o /tmp/tsan_check
//   /tmp/tsan_check /root/reference/data/typical.rz
//
// Exercises, over the real typical.rz stream (16-bit MSB, block 64,
// rsi 256, preprocess):
//   * aectpu_decode_parallel with 2..8 worker threads (scan thread
//     publishing RSI offsets, workers claiming them);
//   * aectpu_scan_blocks with window materialisation on 2..8 filler
//     threads chasing the scan.
// Exit code 0 + no TSAN report = clean.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
int aectpu_decode_parallel(const uint8_t*, size_t, uint64_t, uint8_t*,
                           size_t, size_t*, unsigned, unsigned, unsigned,
                           unsigned, int);
int aectpu_scan_blocks(const uint8_t*, size_t, uint64_t, size_t, int,
                       uint64_t*, uint64_t*, uint32_t*, uint32_t*, uint32_t*,
                       int, size_t*, uint64_t*, unsigned, unsigned, unsigned,
                       unsigned, int);
}

int main(int argc, char** argv) {
    const char* path = argc > 1 ? argv[1] : "/root/reference/data/typical.rz";
    FILE* f = fopen(path, "rb");
    if (!f) { perror("open"); return 2; }
    fseek(f, 0, SEEK_END);
    long len = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> in((size_t)len);
    if (fread(in.data(), 1, (size_t)len, f) != (size_t)len) return 2;
    fclose(f);

    const unsigned bps = 16, bs = 64, rsi = 256, flags = 4 | 8;  // MSB|PP
    const size_t out_cap = 1 << 20;
    std::vector<uint8_t> out(out_cap);
    std::vector<uint8_t> ref;

    for (int threads : {1, 2, 4, 8}) {
        size_t written = 0;
        int st = aectpu_decode_parallel(in.data(), in.size(), 0, out.data(),
                                        out_cap, &written, bps, bs, rsi,
                                        flags, threads);
        if (st != 0 || written != out_cap) {
            fprintf(stderr, "decode_parallel t=%d: st=%d written=%zu\n",
                    threads, st, written);
            return 1;
        }
        if (ref.empty()) ref = out;
        else if (std::memcmp(ref.data(), out.data(), out_cap) != 0) {
            fprintf(stderr, "decode_parallel t=%d: output differs\n",
                    threads);
            return 1;
        }
    }

    const size_t n_rsis = out_cap / ((size_t)rsi * bs * 2);
    const int wf = (int)(bs * bps) / 32 + 2;
    const int max_fs = (int)(bs * bps);
    const size_t nrec = n_rsis * rsi;
    std::vector<uint64_t> fs_off(nrec), lsb_off(nrec);
    std::vector<uint32_t> meta(nrec), refs(nrec), win(nrec * (size_t)wf);
    std::vector<uint32_t> win_ref;
    for (int threads : {1, 2, 4, 8}) {
        size_t n = 0;
        uint64_t tail = 0;
        int st = aectpu_scan_blocks(in.data(), in.size(), 0, n_rsis, max_fs,
                                    fs_off.data(), lsb_off.data(),
                                    meta.data(), refs.data(), win.data(), wf,
                                    &n, &tail, bps, bs, rsi, flags, threads);
        if (st != 0 || n != n_rsis) {
            fprintf(stderr, "scan_blocks t=%d: st=%d n=%zu\n", threads, st,
                    n);
            return 1;
        }
        if (win_ref.empty()) win_ref = win;
        else if (win != win_ref) {
            fprintf(stderr, "scan_blocks t=%d: windows differ\n", threads);
            return 1;
        }
    }
    printf("tsan_check: decode_parallel + scan_blocks clean over %s\n",
           path);
    return 0;
}
