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

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {
int aectpu_decode_parallel(const uint8_t*, size_t, uint64_t, uint8_t*,
                           size_t, size_t*, unsigned, unsigned, unsigned,
                           unsigned, int);
int aectpu_scan_blocks(const uint8_t*, size_t, uint64_t, size_t, int,
                       uint64_t*, uint64_t*, uint32_t*, uint32_t*, uint32_t*,
                       int, size_t*, uint64_t*, unsigned, unsigned, unsigned,
                       unsigned, int);

// C-ABI surface (libaec_abi.cpp): HDF5-style filters call these from
// multiple threads with independent sessions; the stress proves the
// layer has no hidden shared state.
struct SZ_com_t {
    int options_mask, bits_per_pixel, pixels_per_block, pixels_per_scanline;
};
int SZ_BufftoBuffCompress(void*, size_t*, const void*, size_t, SZ_com_t*);
int SZ_BufftoBuffDecompress(void*, size_t*, const void*, size_t, SZ_com_t*);

struct abi_stream {
    const unsigned char* next_in;
    size_t avail_in, total_in;
    unsigned char* next_out;
    size_t avail_out, total_out;
    unsigned bits_per_sample, block_size, rsi, flags;
    void* state;
};
int aec_encode_init(abi_stream*);
int aec_encode(abi_stream*, int);
int aec_encode_end(abi_stream*);
int aec_decode_init(abi_stream*);
int aec_decode(abi_stream*, int);
int aec_decode_end(abi_stream*);
int aectpu_encode(const uint8_t*, size_t, uint8_t*, size_t, size_t*,
                  unsigned, unsigned, unsigned, unsigned);
int aectpu_encode_parallel(const uint8_t*, size_t, uint8_t*, size_t,
                           size_t*, unsigned, unsigned, unsigned, unsigned,
                           int);
}

// One thread's C-ABI workload: SZ round trips plus chunked streaming
// encode->decode sessions over a private slice of the sample data.
static void abi_worker(const std::vector<uint8_t>& raw, int tid,
                       std::atomic<int>* failures) {
    const size_t n = raw.size();
    // SZ round trip (scanline padding path: pps % ppb != 0)
    SZ_com_t prm{16 | 32, 16, 16, 1000};
    std::vector<uint8_t> comp(n + (1 << 16)), back(n);
    for (int rep = 0; rep < 3; rep++) {
        size_t clen = comp.size();
        if (SZ_BufftoBuffCompress(comp.data(), &clen, raw.data(), n, &prm)) {
            failures->fetch_add(1);
            return;
        }
        size_t dlen = n;
        if (SZ_BufftoBuffDecompress(back.data(), &dlen, comp.data(), clen,
                                    &prm) ||
            dlen != n || std::memcmp(back.data(), raw.data(), n) != 0) {
            failures->fetch_add(1);
            return;
        }
    }
    // streaming encode -> streaming decode, 64 KiB buffers
    const unsigned bps = 16, bs = 64, rsi = 64, flags = 4 | 8;
    std::vector<uint8_t> enc;
    {
        abi_stream s{};
        s.bits_per_sample = bps; s.block_size = bs; s.rsi = rsi;
        s.flags = flags;
        if (aec_encode_init(&s)) { failures->fetch_add(1); return; }
        std::vector<uint8_t> buf(1 << 16);
        for (size_t off = 0; off < n; off += (1 << 16)) {
            size_t take = n - off < (1 << 16) ? n - off : (1 << 16);
            s.next_in = raw.data() + off;
            s.avail_in = take;
            int flush = off + take >= n ? 1 : 0;
            do {
                s.next_out = buf.data();
                s.avail_out = buf.size();
                if (aec_encode(&s, flush)) { failures->fetch_add(1); return; }
                enc.insert(enc.end(), buf.data(),
                           buf.data() + (buf.size() - s.avail_out));
            } while (s.avail_out == 0);
        }
        if (aec_encode_end(&s)) { failures->fetch_add(1); return; }
    }
    {
        abi_stream s{};
        s.bits_per_sample = bps; s.block_size = bs; s.rsi = rsi;
        s.flags = flags;
        if (aec_decode_init(&s)) { failures->fetch_add(1); return; }
        std::vector<uint8_t> buf(1 << 16), dec;
        for (size_t off = 0; off < enc.size(); off += (1 << 16)) {
            size_t take =
                enc.size() - off < (1 << 16) ? enc.size() - off : (1 << 16);
            s.next_in = enc.data() + off;
            s.avail_in = take;
            int flush = off + take >= enc.size() ? 1 : 0;
            do {
                s.next_out = buf.data();
                s.avail_out = buf.size();
                if (aec_decode(&s, flush) < 0) {
                    failures->fetch_add(1);
                    return;
                }
                dec.insert(dec.end(), buf.data(),
                           buf.data() + (buf.size() - s.avail_out));
            } while (s.avail_out == 0);
        }
        if (aec_decode_end(&s)) { failures->fetch_add(1); return; }
        if (dec.size() != n || std::memcmp(dec.data(), raw.data(), n) != 0) {
            fprintf(stderr, "abi t=%d: stream round trip differs (%zu)\n",
                    tid, dec.size());
            failures->fetch_add(1);
        }
    }
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
    // concurrent C-ABI sessions: 8 threads, each a private slice of the
    // decoded data, SZ round trips + chunked streaming encode/decode
    {
        size_t written = 0;
        aectpu_decode_parallel(in.data(), in.size(), 0, out.data(), out_cap,
                               &written, bps, bs, rsi, flags, 1);
        std::atomic<int> failures{0};
        std::vector<std::thread> ths;
        for (int t = 0; t < 8; t++)
            ths.emplace_back([&, t] {
                // staggered, overlapping slices so sessions differ
                size_t lo = (size_t)t * (out_cap / 16);
                std::vector<uint8_t> slice(out.begin() + lo,
                                           out.begin() + lo + out_cap / 2);
                abi_worker(slice, t, &failures);
            });
        for (auto& th : ths) th.join();
        if (failures.load()) {
            fprintf(stderr, "abi stress: %d failures\n", failures.load());
            return 1;
        }
    }

    // parallel encoder's work-stealing pools (delta/decide/emit + stitch)
    {
        std::vector<uint8_t> enc_ref(out_cap + (1 << 20));
        std::vector<uint8_t> enc(out_cap + (1 << 20));
        size_t wr = 0;
        aectpu_encode(out.data(), out_cap, enc_ref.data(), enc_ref.size(),
                      &wr, bps, bs, rsi, flags);
        for (int threads : {2, 4, 8}) {
            size_t w2 = 0;
            int st = aectpu_encode_parallel(out.data(), out_cap, enc.data(),
                                            enc.size(), &w2, bps, bs, rsi,
                                            flags, threads);
            if (st != 0 || w2 != wr ||
                std::memcmp(enc.data(), enc_ref.data(), wr) != 0) {
                fprintf(stderr, "encode_parallel t=%d: st=%d w=%zu/%zu\n",
                        threads, st, w2, wr);
                return 1;
            }
        }
    }

    printf("tsan_check: decode_parallel + scan_blocks + encode_parallel + "
           "concurrent C-ABI sessions clean over %s\n", path);
    return 0;
}
