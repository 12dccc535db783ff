// COCO run-length-encoding codec (C++ host op).
//
// TPU-native replacement for the pycocotools C extension used by the
// reference at `segment_anything_cs/utils/amg.py:294-300` (coco_encode_rle)
// and `crowdsam/utils.py:59-70` (coco_decode_rle).  The on-device part of
// RLE (Fortran-order flatten + binarization) happens in JAX; this codec only
// turns host-side byte masks into COCO-compressed count strings and back.
//
// The string format is the standard COCO "compressed RLE": run counts with
// every count after the second stored as a delta against the count two
// positions back, each value emitted as little-endian 5-bit groups with a
// continuation bit, biased by 48 into printable ASCII.
//
// Exposed with a plain C ABI for ctypes.

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Encode one mask given as a Fortran-order flattened byte array (0/1) of
// length n.  Writes the compressed count string into `out` (capacity
// `out_cap`, not NUL-terminated).  Returns the number of chars written, or
// -1 on overflow.
int64_t rle_encode_mask(const uint8_t* data, int64_t n, char* out, int64_t out_cap) {
    // Run-length extraction: counts alternate 0-run, 1-run, ... starting
    // with the number of leading zeros (possibly 0).
    std::vector<int64_t> cnts;
    cnts.reserve(256);
    uint8_t cur = 0;
    int64_t run = 0;
    for (int64_t i = 0; i < n; ++i) {
        uint8_t v = data[i] ? 1 : 0;
        if (v != cur) {
            cnts.push_back(run);
            run = 0;
            cur = v;
        }
        ++run;
    }
    cnts.push_back(run);

    // Compress counts to chars.
    int64_t p = 0;
    const int64_t m = static_cast<int64_t>(cnts.size());
    for (int64_t i = 0; i < m; ++i) {
        int64_t x = cnts[i];
        if (i > 2) x -= cnts[i - 2];
        bool more = true;
        while (more) {
            int64_t c = x & 0x1f;
            x >>= 5;
            more = (c & 0x10) ? (x != -1) : (x != 0);
            if (more) c |= 0x20;
            c += 48;
            if (p >= out_cap) return -1;
            out[p++] = static_cast<char>(c);
        }
    }
    return p;
}

// Decode a compressed count string back into a Fortran-order byte mask of
// length n.  Returns 0 on success, -1 if the decoded runs overflow n.
int64_t rle_decode_mask(const char* s, int64_t slen, uint8_t* out, int64_t n) {
    std::vector<int64_t> cnts;
    cnts.reserve(256);
    int64_t i = 0;
    while (i < slen) {
        int64_t x = 0;
        int k = 0;
        bool more = true;
        while (more) {
            if (i >= slen) return -1;
            int64_t c = static_cast<int64_t>(s[i]) - 48;
            x |= (c & 0x1f) << (5 * k);
            more = (c & 0x20) != 0;
            ++i;
            ++k;
            if (!more && (c & 0x10)) x |= -1LL << (5 * k);
        }
        if (cnts.size() > 2) x += cnts[cnts.size() - 2];
        cnts.push_back(x);
    }
    int64_t pos = 0;
    uint8_t v = 0;
    for (int64_t cidx = 0; cidx < static_cast<int64_t>(cnts.size()); ++cidx) {
        int64_t c = cnts[cidx];
        if (c < 0 || pos + c > n) return -1;
        std::memset(out + pos, v, static_cast<size_t>(c));
        pos += c;
        v ^= 1;
    }
    if (pos != n) return -1;
    return 0;
}

// Batched encode: B masks, each of length n, stored contiguously.  Writes
// each mask's string into `out + b*out_stride` and its length into lens[b].
// Returns 0 on success, -1 if any mask overflowed its capacity.
int64_t rle_encode_batch(const uint8_t* data, int64_t b, int64_t n,
                         char* out, int64_t out_stride, int64_t* lens) {
    int64_t status = 0;
    for (int64_t i = 0; i < b; ++i) {
        int64_t len = rle_encode_mask(data + i * n, n, out + i * out_stride, out_stride);
        if (len < 0) { status = -1; len = 0; }
        lens[i] = len;
    }
    return status;
}

// Compress a ready-made counts array to the COCO string format.  Used by
// the device-side RLE path, where the TPU ships change indices and the
// host only turns count diffs into the printable varint string.
int64_t rle_compress_counts(const int64_t* cnts, int64_t m,
                            char* out, int64_t out_cap) {
    int64_t p = 0;
    for (int64_t i = 0; i < m; ++i) {
        int64_t x = cnts[i];
        if (i > 2) x -= cnts[i - 2];
        bool more = true;
        while (more) {
            int64_t c = x & 0x1f;
            x >>= 5;
            more = (c & 0x10) ? (x != -1) : (x != 0);
            if (more) c |= 0x20;
            c += 48;
            if (p >= out_cap) return -1;
            out[p++] = static_cast<char>(c);
        }
    }
    return p;
}

// Sum of odd-indexed counts = foreground area, from a compressed string.
int64_t rle_area(const char* s, int64_t slen) {
    int64_t area = 0;
    std::vector<int64_t> cnts;
    int64_t i = 0;
    while (i < slen) {
        int64_t x = 0;
        int k = 0;
        bool more = true;
        while (more) {
            if (i >= slen) return -1;
            int64_t c = static_cast<int64_t>(s[i]) - 48;
            x |= (c & 0x1f) << (5 * k);
            more = (c & 0x20) != 0;
            ++i;
            ++k;
            if (!more && (c & 0x10)) x |= -1LL << (5 * k);
        }
        if (cnts.size() > 2) x += cnts[cnts.size() - 2];
        cnts.push_back(x);
    }
    for (size_t j = 1; j < cnts.size(); j += 2) area += cnts[j];
    return area;
}

}  // extern "C"
