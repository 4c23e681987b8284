// GROMACS XTC trajectory codec (read + write), first-party implementation.
//
// Implements the XDR-encoded XTC frame format with the standard 3dfcoord
// integer compression scheme (quantize to precision, adaptive small-delta
// runs over the magicints ladder). The algorithm is reimplemented from the
// published format specification; no third-party code is used.
//
// Role parity: the reference reads .xtc through mdtraj's C plugin
// (src/pmarlo/io/trajectory_reader.py:187,214). Exposed via ctypes from
// pmarlo_tpu/io/xtc.py.
//
// C ABI:
//   pmarlo_xtc_probe(path, &n_frames, &n_atoms)        -> 0 on success
//   pmarlo_xtc_read(path, coords, steps, times, box,
//                   start, count, n_atoms)             -> 0 on success
//   pmarlo_xtc_write(path, coords, steps, times, box,
//                    n_frames, n_atoms, precision)     -> 0 on success
//
// Coordinates are float32 nm (the native XTC unit), layout (T, N, 3).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <climits>
#include <vector>

namespace {

const int XTC_MAGIC = 1995;
const double MAXABS = double(INT_MAX) - 2.0;

const int magicints[] = {
    0,       0,       0,       0,       0,        0,        0,
    0,       0,       8,       10,      12,       16,       20,
    25,      32,      40,      50,      64,       80,       101,
    128,     161,     203,     256,     322,      406,      512,
    645,     812,     1024,    1290,    1625,     2048,     2580,
    3250,    4096,    5060,    6501,    8192,     10321,    13003,
    16384,   20642,   26007,   32768,   41285,    52015,    65536,
    82570,   104031,  131072,  165140,  208063,   262144,   330280,
    416127,  524287,  660561,  827031,  1048576,  1321122,  1664510,
    2097152, 2642245, 3329021, 4194304, 5284491,  6658042,  8388607,
    10568983, 13316085, 16777216};

const int FIRSTIDX = 9;
const int LASTIDX = int(sizeof(magicints) / sizeof(*magicints));  // 73

// ---- big-endian (XDR) primitive I/O over a memory buffer --------------------

struct Reader {
    const uint8_t* p;
    size_t len;
    size_t off = 0;
    bool ok = true;

    bool need(size_t n) {
        if (off + n > len) { ok = false; return false; }
        return true;
    }
    int32_t rd_i32() {
        if (!need(4)) return 0;
        int32_t v = (int32_t)((uint32_t(p[off]) << 24) | (uint32_t(p[off + 1]) << 16) |
                              (uint32_t(p[off + 2]) << 8) | uint32_t(p[off + 3]));
        off += 4;
        return v;
    }
    float rd_f32() {
        int32_t v = rd_i32();
        float f;
        std::memcpy(&f, &v, 4);
        return f;
    }
    const uint8_t* rd_bytes(size_t n) {
        size_t padded = (n + 3) & ~size_t(3);
        if (!need(padded)) return nullptr;
        const uint8_t* q = p + off;
        off += padded;
        return q;
    }
};

struct Writer {
    std::vector<uint8_t> out;

    void wr_i32(int32_t v) {
        uint32_t u = (uint32_t)v;
        out.push_back(uint8_t(u >> 24));
        out.push_back(uint8_t(u >> 16));
        out.push_back(uint8_t(u >> 8));
        out.push_back(uint8_t(u));
    }
    void wr_f32(float f) {
        int32_t v;
        std::memcpy(&v, &f, 4);
        wr_i32(v);
    }
    void wr_bytes(const uint8_t* q, size_t n) {
        out.insert(out.end(), q, q + n);
        while (n & 3) { out.push_back(0); n++; }
    }
};

// ---- bit stream --------------------------------------------------------------

// State mirrors the classic int-buffer header: cnt (byte cursor), lastbits,
// lastbyte; data lives in a byte vector.
struct BitCursor {
    unsigned int cnt = 0;
    int lastbits = 0;
    unsigned int lastbyte = 0;
};

void sendbits(BitCursor& c, std::vector<uint8_t>& data, int num_of_bits,
              unsigned int num) {
    unsigned int cnt = c.cnt, lastbyte = c.lastbyte;
    int lastbits = c.lastbits;
    auto put = [&](uint8_t b) {
        if (cnt >= data.size()) data.resize(data.size() * 2 + 64);
        data[cnt++] = b;
    };
    while (num_of_bits >= 8) {
        lastbyte = (lastbyte << 8) | ((num >> (num_of_bits - 8)) & 0xff);
        put(uint8_t(lastbyte >> lastbits));
        num_of_bits -= 8;
    }
    if (num_of_bits > 0) {
        lastbyte = (lastbyte << num_of_bits) | (num & ((1u << num_of_bits) - 1));
        lastbits += num_of_bits;
        if (lastbits >= 8) {
            lastbits -= 8;
            put(uint8_t(lastbyte >> lastbits));
        }
    }
    c.cnt = cnt;
    c.lastbits = lastbits;
    c.lastbyte = lastbyte;
    if (lastbits > 0) {
        if (cnt >= data.size()) data.resize(data.size() * 2 + 64);
        data[cnt] = uint8_t(lastbyte << (8 - lastbits));
    }
}

unsigned int receivebits(BitCursor& c, const uint8_t* data, size_t len,
                         int num_of_bits, bool* ok) {
    unsigned int mask = num_of_bits < 32 ? (1u << num_of_bits) - 1 : 0xffffffffu;
    unsigned int cnt = c.cnt, lastbyte = c.lastbyte;
    int lastbits = c.lastbits;
    unsigned int num = 0;
    auto get = [&]() -> unsigned int {
        if (cnt >= len) { *ok = false; return 0; }
        return data[cnt++];
    };
    while (num_of_bits >= 8) {
        lastbyte = (lastbyte << 8) | get();
        num |= (lastbyte >> lastbits) << (num_of_bits - 8);
        num_of_bits -= 8;
    }
    if (num_of_bits > 0) {
        if (lastbits < num_of_bits) {
            lastbits += 8;
            lastbyte = (lastbyte << 8) | get();
        }
        lastbits -= num_of_bits;
        num |= (lastbyte >> lastbits) & ((1u << num_of_bits) - 1);
    }
    num &= mask;
    c.cnt = cnt;
    c.lastbits = lastbits;
    c.lastbyte = lastbyte;
    return num;
}

int sizeofint(int size) {
    int num = 1, num_of_bits = 0;
    while (size >= num && num_of_bits < 32) {
        num_of_bits++;
        num <<= 1;
    }
    return num_of_bits;
}

int sizeofints(int num_of_ints, const unsigned int sizes[]) {
    int bytes[32];
    unsigned int num_of_bytes = 1, num_of_bits = 0, bytecnt, tmp;
    bytes[0] = 1;
    for (int i = 0; i < num_of_ints; i++) {
        tmp = 0;
        for (bytecnt = 0; bytecnt < num_of_bytes; bytecnt++) {
            tmp = bytes[bytecnt] * sizes[i] + tmp;
            bytes[bytecnt] = tmp & 0xff;
            tmp >>= 8;
        }
        while (tmp != 0) {
            bytes[bytecnt++] = tmp & 0xff;
            tmp >>= 8;
        }
        num_of_bytes = bytecnt;
    }
    unsigned int num = 1;
    num_of_bytes--;
    while ((unsigned int)bytes[num_of_bytes] >= num) {
        num_of_bits++;
        num *= 2;
    }
    return int(num_of_bits + num_of_bytes * 8);
}

void sendints(BitCursor& c, std::vector<uint8_t>& data, int num_of_ints,
              int num_of_bits, const unsigned int sizes[],
              const unsigned int nums[]) {
    unsigned int bytes[32], tmp;
    int num_of_bytes = 0, bytecnt;
    tmp = nums[0];
    do {
        bytes[num_of_bytes++] = tmp & 0xff;
        tmp >>= 8;
    } while (tmp != 0);
    for (int i = 1; i < num_of_ints; i++) {
        tmp = nums[i];
        for (bytecnt = 0; bytecnt < num_of_bytes; bytecnt++) {
            tmp = bytes[bytecnt] * sizes[i] + tmp;
            bytes[bytecnt] = tmp & 0xff;
            tmp >>= 8;
        }
        while (tmp != 0) {
            bytes[bytecnt++] = tmp & 0xff;
            tmp >>= 8;
        }
        num_of_bytes = bytecnt;
    }
    if (num_of_bits >= num_of_bytes * 8) {
        for (int i = 0; i < num_of_bytes; i++) sendbits(c, data, 8, bytes[i]);
        sendbits(c, data, num_of_bits - num_of_bytes * 8, 0);
    } else {
        int i = 0;
        for (; i < num_of_bytes - 1; i++) sendbits(c, data, 8, bytes[i]);
        sendbits(c, data, num_of_bits - (num_of_bytes - 1) * 8, bytes[i]);
    }
}

void receiveints(BitCursor& c, const uint8_t* data, size_t len,
                 int num_of_ints, int num_of_bits, const unsigned int sizes[],
                 int nums[], bool* ok) {
    int bytes[32];
    int num_of_bytes = 0;
    bytes[0] = bytes[1] = bytes[2] = bytes[3] = 0;
    while (num_of_bits > 8) {
        bytes[num_of_bytes++] = int(receivebits(c, data, len, 8, ok));
        num_of_bits -= 8;
    }
    if (num_of_bits > 0) {
        bytes[num_of_bytes++] = int(receivebits(c, data, len, num_of_bits, ok));
    }
    for (int i = num_of_ints - 1; i > 0; i--) {
        unsigned int num = 0;
        for (int j = num_of_bytes - 1; j >= 0; j--) {
            num = (num << 8) | (unsigned int)bytes[j];
            unsigned int p = num / sizes[i];
            bytes[j] = int(p);
            num = num - p * sizes[i];
        }
        nums[i] = int(num);
    }
    nums[0] = bytes[0] | (bytes[1] << 8) | (bytes[2] << 16) | (bytes[3] << 24);
}

// ---- 3dfcoord compression ------------------------------------------------------

// Encode one frame of `size` atoms (float nm) into the writer. Returns false
// if a coordinate overflows the quantization range.
bool encode_coords(Writer& w, const float* fp, int size, float precision) {
    w.wr_i32(size);
    if (size <= 9) {
        for (int i = 0; i < size * 3; i++) w.wr_f32(fp[i]);
        return true;
    }
    w.wr_f32(precision);

    std::vector<int> lip(size_t(size) * 3);
    int minint[3] = {INT_MAX, INT_MAX, INT_MAX};
    int maxint[3] = {INT_MIN, INT_MIN, INT_MIN};
    int mindiff = INT_MAX;
    int oldlint[3] = {0, 0, 0};
    for (int i = 0; i < size; i++) {
        int lint[3];
        for (int d = 0; d < 3; d++) {
            double lf = double(fp[i * 3 + d]) * precision;
            lf += (lf >= 0.0) ? 0.5 : -0.5;
            if (std::fabs(lf) > MAXABS) return false;
            lint[d] = int(lf);
            if (lint[d] < minint[d]) minint[d] = lint[d];
            if (lint[d] > maxint[d]) maxint[d] = lint[d];
            lip[size_t(i) * 3 + d] = lint[d];
        }
        if (i > 0) {
            int diff = std::abs(oldlint[0] - lint[0]) +
                       std::abs(oldlint[1] - lint[1]) +
                       std::abs(oldlint[2] - lint[2]);
            if (diff < mindiff) mindiff = diff;
        }
        oldlint[0] = lint[0];
        oldlint[1] = lint[1];
        oldlint[2] = lint[2];
    }
    for (int d = 0; d < 3; d++) w.wr_i32(minint[d]);
    for (int d = 0; d < 3; d++) w.wr_i32(maxint[d]);

    unsigned int sizeint[3], bitsizeint[3] = {0, 0, 0};
    for (int d = 0; d < 3; d++)
        sizeint[d] = (unsigned int)(maxint[d] - minint[d]) + 1u;
    int bitsize;
    if (sizeint[0] > 0xffffff || sizeint[1] > 0xffffff || sizeint[2] > 0xffffff) {
        for (int d = 0; d < 3; d++) bitsizeint[d] = sizeofint(int(sizeint[d]));
        bitsize = 0;
    } else {
        bitsize = sizeofints(3, sizeint);
    }

    int smallidx = FIRSTIDX;
    while (smallidx < LASTIDX - 1 && magicints[smallidx] < mindiff) smallidx++;
    w.wr_i32(smallidx);

    int maxidx = smallidx + 8 < LASTIDX - 1 ? smallidx + 8 : LASTIDX - 1;
    int minidx = maxidx - 8;
    int larger = magicints[maxidx] / 2;
    int smaller = magicints[smallidx - 1 > FIRSTIDX ? smallidx - 1 : FIRSTIDX] / 2;
    int smallnum = magicints[smallidx] / 2;
    unsigned int sizesmall[3] = {(unsigned int)magicints[smallidx],
                                 (unsigned int)magicints[smallidx],
                                 (unsigned int)magicints[smallidx]};

    std::vector<uint8_t> data(size_t(size) * 3 * 4 + 64);
    BitCursor c;
    int prevrun = -1;
    int prevcoord[3] = {0, 0, 0};
    unsigned int tmpcoord[30];
    int i = 0;
    while (i < size) {
        bool is_small = false;
        int* thiscoord = lip.data() + size_t(i) * 3;
        int is_smaller;
        if (smallidx < maxidx && i >= 1 &&
            std::abs(thiscoord[0] - prevcoord[0]) < larger &&
            std::abs(thiscoord[1] - prevcoord[1]) < larger &&
            std::abs(thiscoord[2] - prevcoord[2]) < larger) {
            is_smaller = 1;
        } else if (smallidx > minidx) {
            is_smaller = -1;
        } else {
            is_smaller = 0;
        }
        if (i + 1 < size) {
            if (std::abs(thiscoord[0] - thiscoord[3]) < smallnum &&
                std::abs(thiscoord[1] - thiscoord[4]) < smallnum &&
                std::abs(thiscoord[2] - thiscoord[5]) < smallnum) {
                // interchange first with second atom: water-like pairs
                // compress better with the heavier atom first
                for (int d = 0; d < 3; d++) {
                    int t = thiscoord[d];
                    thiscoord[d] = thiscoord[d + 3];
                    thiscoord[d + 3] = t;
                }
                is_small = true;
            }
        }
        tmpcoord[0] = (unsigned int)(thiscoord[0] - minint[0]);
        tmpcoord[1] = (unsigned int)(thiscoord[1] - minint[1]);
        tmpcoord[2] = (unsigned int)(thiscoord[2] - minint[2]);
        if (bitsize == 0) {
            sendbits(c, data, int(bitsizeint[0]), tmpcoord[0]);
            sendbits(c, data, int(bitsizeint[1]), tmpcoord[1]);
            sendbits(c, data, int(bitsizeint[2]), tmpcoord[2]);
        } else {
            sendints(c, data, 3, bitsize, sizeint, tmpcoord);
        }
        prevcoord[0] = thiscoord[0];
        prevcoord[1] = thiscoord[1];
        prevcoord[2] = thiscoord[2];
        thiscoord += 3;
        i++;

        int run = 0;
        if (!is_small && is_smaller == -1) is_smaller = 0;
        while (is_small && run < 8 * 3) {
            long long d0 = thiscoord[0] - prevcoord[0];
            long long d1 = thiscoord[1] - prevcoord[1];
            long long d2 = thiscoord[2] - prevcoord[2];
            if (is_smaller == -1 &&
                d0 * d0 + d1 * d1 + d2 * d2 >=
                    (long long)smaller * (long long)smaller) {
                is_smaller = 0;
            }
            tmpcoord[run++] = (unsigned int)(thiscoord[0] - prevcoord[0] + smallnum);
            tmpcoord[run++] = (unsigned int)(thiscoord[1] - prevcoord[1] + smallnum);
            tmpcoord[run++] = (unsigned int)(thiscoord[2] - prevcoord[2] + smallnum);
            prevcoord[0] = thiscoord[0];
            prevcoord[1] = thiscoord[1];
            prevcoord[2] = thiscoord[2];
            i++;
            thiscoord += 3;
            is_small = false;
            if (i < size && std::abs(thiscoord[0] - prevcoord[0]) < smallnum &&
                std::abs(thiscoord[1] - prevcoord[1]) < smallnum &&
                std::abs(thiscoord[2] - prevcoord[2]) < smallnum) {
                is_small = true;
            }
        }
        if (run != prevrun || is_smaller != 0) {
            prevrun = run;
            sendbits(c, data, 1, 1);
            sendbits(c, data, 5, (unsigned int)(run + is_smaller + 1));
        } else {
            sendbits(c, data, 1, 0);
        }
        for (int k = 0; k < run; k += 3) {
            sendints(c, data, 3, smallidx, sizesmall, &tmpcoord[k]);
        }
        if (is_smaller != 0) {
            smallidx += is_smaller;
            if (is_smaller < 0) {
                smallnum = smaller;
                smaller = magicints[smallidx - 1] / 2;
            } else {
                smaller = smallnum;
                smallnum = magicints[smallidx] / 2;
            }
            sizesmall[0] = sizesmall[1] = sizesmall[2] =
                (unsigned int)magicints[smallidx];
        }
    }
    unsigned int nbytes = c.cnt + (c.lastbits != 0 ? 1 : 0);
    w.wr_i32(int32_t(nbytes));
    w.wr_bytes(data.data(), nbytes);
    return true;
}

// Decode one frame's coordinate block; `fp` receives size*3 floats (nm).
bool decode_coords(Reader& r, float* fp, int size) {
    int lsize = r.rd_i32();
    if (!r.ok || lsize != size) return false;
    if (size <= 9) {
        for (int i = 0; i < size * 3; i++) fp[i] = r.rd_f32();
        return r.ok;
    }
    float precision = r.rd_f32();
    int minint[3], maxint[3];
    for (int d = 0; d < 3; d++) minint[d] = r.rd_i32();
    for (int d = 0; d < 3; d++) maxint[d] = r.rd_i32();

    unsigned int sizeint[3], bitsizeint[3] = {0, 0, 0};
    for (int d = 0; d < 3; d++)
        sizeint[d] = (unsigned int)(maxint[d] - minint[d]) + 1u;
    int bitsize;
    if (sizeint[0] > 0xffffff || sizeint[1] > 0xffffff || sizeint[2] > 0xffffff) {
        for (int d = 0; d < 3; d++) bitsizeint[d] = sizeofint(int(sizeint[d]));
        bitsize = 0;
    } else {
        bitsize = sizeofints(3, sizeint);
    }
    int smallidx = r.rd_i32();
    if (!r.ok || smallidx < FIRSTIDX || smallidx >= LASTIDX) return false;
    int smaller = magicints[smallidx - 1 > FIRSTIDX ? smallidx - 1 : FIRSTIDX] / 2;
    int smallnum = magicints[smallidx] / 2;
    unsigned int sizesmall[3] = {(unsigned int)magicints[smallidx],
                                 (unsigned int)magicints[smallidx],
                                 (unsigned int)magicints[smallidx]};

    int nbytes = r.rd_i32();
    if (!r.ok || nbytes < 0) return false;
    const uint8_t* data = r.rd_bytes(size_t(nbytes));
    if (data == nullptr) return false;

    float inv_precision = 1.0f / precision;
    BitCursor c;
    bool ok = true;
    int run = 0;
    int i = 0;
    int prevcoord[3] = {0, 0, 0};
    int thiscoord[3];
    float* lfp = fp;
    while (i < size && ok) {
        if (bitsize == 0) {
            thiscoord[0] = int(receivebits(c, data, nbytes, int(bitsizeint[0]), &ok));
            thiscoord[1] = int(receivebits(c, data, nbytes, int(bitsizeint[1]), &ok));
            thiscoord[2] = int(receivebits(c, data, nbytes, int(bitsizeint[2]), &ok));
        } else {
            receiveints(c, data, nbytes, 3, bitsize, sizeint, thiscoord, &ok);
        }
        i++;
        thiscoord[0] += minint[0];
        thiscoord[1] += minint[1];
        thiscoord[2] += minint[2];
        prevcoord[0] = thiscoord[0];
        prevcoord[1] = thiscoord[1];
        prevcoord[2] = thiscoord[2];

        unsigned int flag = receivebits(c, data, nbytes, 1, &ok);
        int is_smaller = 0;
        if (flag == 1) {
            run = int(receivebits(c, data, nbytes, 5, &ok));
            is_smaller = run % 3;
            run -= is_smaller;
            is_smaller--;
        }
        if (run > 0) {
            for (int k = 0; k < run && ok; k += 3) {
                if (i >= size) { ok = false; break; }
                receiveints(c, data, nbytes, 3, smallidx, sizesmall, thiscoord, &ok);
                i++;
                thiscoord[0] += prevcoord[0] - smallnum;
                thiscoord[1] += prevcoord[1] - smallnum;
                thiscoord[2] += prevcoord[2] - smallnum;
                if (k == 0) {
                    // undo the encoder's first/second interchange
                    for (int d = 0; d < 3; d++) {
                        int t = thiscoord[d];
                        thiscoord[d] = prevcoord[d];
                        prevcoord[d] = t;
                    }
                    *lfp++ = float(prevcoord[0]) * inv_precision;
                    *lfp++ = float(prevcoord[1]) * inv_precision;
                    *lfp++ = float(prevcoord[2]) * inv_precision;
                } else {
                    prevcoord[0] = thiscoord[0];
                    prevcoord[1] = thiscoord[1];
                    prevcoord[2] = thiscoord[2];
                }
                *lfp++ = float(thiscoord[0]) * inv_precision;
                *lfp++ = float(thiscoord[1]) * inv_precision;
                *lfp++ = float(thiscoord[2]) * inv_precision;
            }
        } else {
            *lfp++ = float(thiscoord[0]) * inv_precision;
            *lfp++ = float(thiscoord[1]) * inv_precision;
            *lfp++ = float(thiscoord[2]) * inv_precision;
        }
        smallidx += is_smaller;
        if (is_smaller < 0) {
            smallnum = smaller;
            smaller = (smallidx > FIRSTIDX) ? magicints[smallidx - 1] / 2 : 0;
        } else if (is_smaller > 0) {
            smaller = smallnum;
            smallnum = magicints[smallidx] / 2;
        }
        sizesmall[0] = sizesmall[1] = sizesmall[2] =
            (unsigned int)magicints[smallidx];
        if (sizesmall[0] == 0) return false;
    }
    return ok && i == size;
}

// Skip past one frame starting at r.off (header must have been validated by
// caller via magic). Returns false on malformed data.
bool skip_frame(Reader& r, int* natoms_out, int* step_out, float* time_out,
                float* box_out) {
    int magic = r.rd_i32();
    if (!r.ok || magic != XTC_MAGIC) return false;
    int natoms = r.rd_i32();
    int step = r.rd_i32();
    float time = r.rd_f32();
    float box[9];
    for (int d = 0; d < 9; d++) box[d] = r.rd_f32();
    if (!r.ok || natoms <= 0) return false;
    if (natoms_out) *natoms_out = natoms;
    if (step_out) *step_out = step;
    if (time_out) *time_out = time;
    if (box_out) std::memcpy(box_out, box, sizeof(box));
    int lsize = r.rd_i32();
    if (!r.ok || lsize != natoms) return false;
    if (natoms <= 9) {
        for (int i = 0; i < natoms * 3 && r.ok; i++) r.rd_f32();
        return r.ok;
    }
    r.rd_f32();                                 // precision
    for (int d = 0; d < 6; d++) r.rd_i32();     // minint, maxint
    r.rd_i32();                                 // smallidx
    int nbytes = r.rd_i32();
    if (!r.ok || nbytes < 0) return false;
    return r.rd_bytes(size_t(nbytes)) != nullptr;
}

std::vector<uint8_t> read_file(const char* path) {
    std::vector<uint8_t> buf;
    FILE* f = std::fopen(path, "rb");
    if (!f) return buf;
    std::fseek(f, 0, SEEK_END);
    long n = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    if (n > 0) {
        buf.resize(size_t(n));
        if (std::fread(buf.data(), 1, size_t(n), f) != size_t(n)) buf.clear();
    }
    std::fclose(f);
    return buf;
}

}  // namespace

extern "C" {

int pmarlo_xtc_probe(const char* path, int64_t* n_frames, int64_t* n_atoms) {
    std::vector<uint8_t> buf = read_file(path);
    if (buf.empty()) return 1;
    Reader r{buf.data(), buf.size()};
    int64_t frames = 0;
    int natoms = 0, first_natoms = 0;
    while (r.off < r.len) {
        if (!skip_frame(r, &natoms, nullptr, nullptr, nullptr)) return 2;
        if (frames == 0) first_natoms = natoms;
        else if (natoms != first_natoms) return 3;
        frames++;
    }
    *n_frames = frames;
    *n_atoms = first_natoms;
    return 0;
}

// coords: (count, n_atoms, 3) float32 out; steps: (count,) int32 out;
// times: (count,) float32 out; box: (count, 9) float32 out. Any of
// steps/times/box may be NULL.
int pmarlo_xtc_read(const char* path, float* coords, int32_t* steps,
                    float* times, float* box, int64_t start, int64_t count,
                    int64_t n_atoms) {
    std::vector<uint8_t> buf = read_file(path);
    if (buf.empty()) return 1;
    Reader r{buf.data(), buf.size()};
    for (int64_t i = 0; i < start; i++) {
        if (!skip_frame(r, nullptr, nullptr, nullptr, nullptr)) return 2;
    }
    for (int64_t i = 0; i < count; i++) {
        int magic = r.rd_i32();
        if (!r.ok || magic != XTC_MAGIC) return 2;
        int natoms = r.rd_i32();
        int step = r.rd_i32();
        float time = r.rd_f32();
        float bx[9];
        for (int d = 0; d < 9; d++) bx[d] = r.rd_f32();
        if (!r.ok || natoms != n_atoms) return 3;
        if (steps) steps[i] = step;
        if (times) times[i] = time;
        if (box) std::memcpy(box + i * 9, bx, sizeof(bx));
        if (!decode_coords(r, coords + i * n_atoms * 3, int(natoms))) return 4;
    }
    return 0;
}

// coords: (n_frames, n_atoms, 3) float32 nm; steps/times/box may be NULL
// (defaults: step=i, time=0, box=0).
int pmarlo_xtc_write(const char* path, const float* coords,
                     const int32_t* steps, const float* times,
                     const float* box, int64_t n_frames, int64_t n_atoms,
                     float precision) {
    Writer w;
    for (int64_t i = 0; i < n_frames; i++) {
        w.wr_i32(XTC_MAGIC);
        w.wr_i32(int32_t(n_atoms));
        w.wr_i32(steps ? steps[i] : int32_t(i));
        w.wr_f32(times ? times[i] : 0.0f);
        for (int d = 0; d < 9; d++) w.wr_f32(box ? box[i * 9 + d] : 0.0f);
        if (!encode_coords(w, coords + i * n_atoms * 3, int(n_atoms), precision))
            return 2;
    }
    FILE* f = std::fopen(path, "wb");
    if (!f) return 1;
    size_t written = std::fwrite(w.out.data(), 1, w.out.size(), f);
    std::fclose(f);
    return written == w.out.size() ? 0 : 1;
}

}  // extern "C"
