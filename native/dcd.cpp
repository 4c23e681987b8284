// Native DCD (CHARMM/NAMD binary trajectory) codec.
//
// First-party replacement for the role mdtraj's C DCD plugin plays in the
// reference (src/pmarlo/io/trajectory.py:100 iterload; trajectory_writer.py
// MDTrajDCDWriter). Exposed through ctypes (pmarlo_tpu/io/dcd.py), with a
// pure-Python fallback when no C++ toolchain is available.
//
// Format: Fortran unformatted records. Header record (84 bytes, magic
// "CORD", icntrl[20]), title record, natoms record; one X/Y/Z float record
// triplet per frame (optionally preceded by a 6-double unit-cell record).
// Coordinates are in Angstrom by convention.
//
// Build: g++ -O2 -shared -fPIC -o libpmarlo_dcd.so dcd.cpp

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

bool write_record(std::FILE* f, const void* data, int32_t nbytes) {
    if (std::fwrite(&nbytes, 4, 1, f) != 1) return false;
    if (nbytes > 0 && std::fwrite(data, 1, (size_t)nbytes, f) != (size_t)nbytes)
        return false;
    if (std::fwrite(&nbytes, 4, 1, f) != 1) return false;
    return true;
}

bool read_record(std::FILE* f, std::vector<char>& buf) {
    int32_t n0 = 0, n1 = 0;
    if (std::fread(&n0, 4, 1, f) != 1) return false;
    if (n0 < 0 || n0 > (1 << 30)) return false;
    buf.resize((size_t)n0);
    if (n0 > 0 && std::fread(buf.data(), 1, (size_t)n0, f) != (size_t)n0)
        return false;
    if (std::fread(&n1, 4, 1, f) != 1) return false;
    return n0 == n1;
}

}  // namespace

extern "C" {

// Write a DCD file. coords: (n_frames, n_atoms, 3) float32, Angstrom.
// cells: optional (n_frames, 6) float64 X-PLOR unit-cell records
// [a, cos(gamma), b, cos(beta), cos(alpha), c] in Angstrom (NULL for a
// cell-less file). Returns 0 on success, negative error codes otherwise.
int pmarlo_dcd_write_cells(const char* path, const float* coords,
                           int64_t n_frames, int64_t n_atoms, double dt_ps,
                           int64_t save_interval, const double* cells) {
    if (!path || !coords || n_frames <= 0 || n_atoms <= 0) return -1;
    std::FILE* f = std::fopen(path, "wb");
    if (!f) return -2;

    // header: "CORD" + icntrl[20]
    char header[84];
    std::memset(header, 0, sizeof(header));
    std::memcpy(header, "CORD", 4);
    int32_t* icntrl = reinterpret_cast<int32_t*>(header + 4);
    icntrl[0] = (int32_t)n_frames;       // NSET
    icntrl[1] = 1;                       // ISTART
    icntrl[2] = (int32_t)save_interval;  // NSAVC
    icntrl[3] = (int32_t)(n_frames * save_interval);  // NSTEP
    float delta = (float)(dt_ps / 0.0488882129);      // AKMA time units
    std::memcpy(&icntrl[9], &delta, 4);               // DELTA
    icntrl[10] = cells ? 1 : 0;          // unit-cell flag
    icntrl[19] = 24;                     // CHARMM version stamp
    if (!write_record(f, header, 84)) { std::fclose(f); return -3; }

    // title record: ntitle(int32) + 80-char line
    char title_rec[4 + 80];
    int32_t ntitle = 1;
    std::memcpy(title_rec, &ntitle, 4);
    std::memset(title_rec + 4, ' ', 80);
    std::memcpy(title_rec + 4, "Created by pmarlo_tpu native DCD writer", 40);
    if (!write_record(f, title_rec, sizeof(title_rec))) { std::fclose(f); return -3; }

    int32_t natoms32 = (int32_t)n_atoms;
    if (!write_record(f, &natoms32, 4)) { std::fclose(f); return -3; }

    std::vector<float> axis((size_t)n_atoms);
    const int32_t rec = (int32_t)(4 * n_atoms);
    for (int64_t fr = 0; fr < n_frames; ++fr) {
        if (cells) {
            if (!write_record(f, cells + fr * 6, 48)) {
                std::fclose(f);
                return -4;
            }
        }
        const float* frame = coords + fr * n_atoms * 3;
        for (int d = 0; d < 3; ++d) {
            for (int64_t a = 0; a < n_atoms; ++a) axis[(size_t)a] = frame[a * 3 + d];
            if (!write_record(f, axis.data(), rec)) { std::fclose(f); return -4; }
        }
    }
    std::fclose(f);
    return 0;
}

// Back-compat cell-less entry point.
int pmarlo_dcd_write(const char* path, const float* coords, int64_t n_frames,
                     int64_t n_atoms, double dt_ps, int64_t save_interval) {
    return pmarlo_dcd_write_cells(path, coords, n_frames, n_atoms, dt_ps,
                                  save_interval, nullptr);
}

// Probe a DCD file: fills n_frames/n_atoms/has_cell. Returns 0 on success.
int pmarlo_dcd_probe(const char* path, int64_t* n_frames, int64_t* n_atoms,
                     int32_t* has_cell) {
    if (!path) return -1;
    std::FILE* f = std::fopen(path, "rb");
    if (!f) return -2;
    std::vector<char> buf;
    if (!read_record(f, buf) || buf.size() != 84 ||
        std::memcmp(buf.data(), "CORD", 4) != 0) { std::fclose(f); return -3; }
    const int32_t* icntrl = reinterpret_cast<const int32_t*>(buf.data() + 4);
    int32_t nset = icntrl[0];
    int32_t cell = icntrl[10];
    if (!read_record(f, buf)) { std::fclose(f); return -3; }  // title
    if (!read_record(f, buf) || buf.size() != 4) { std::fclose(f); return -3; }
    int32_t natoms = 0;
    std::memcpy(&natoms, buf.data(), 4);
    if (natoms <= 0) { std::fclose(f); return -3; }

    if (nset <= 0) {
        // count frames by scanning records
        long data_start = std::ftell(f);
        int64_t count = 0;
        while (true) {
            if (cell && !read_record(f, buf)) break;
            bool ok = true;
            for (int d = 0; d < 3 && ok; ++d) ok = read_record(f, buf);
            if (!ok) break;
            ++count;
        }
        nset = (int32_t)count;
        std::fseek(f, data_start, SEEK_SET);
    }
    *n_frames = nset;
    *n_atoms = natoms;
    *has_cell = cell != 0;
    std::fclose(f);
    return 0;
}

// Read frames [start, start+count) into out (count, n_atoms, 3) float32.
int pmarlo_dcd_read(const char* path, float* out, int64_t start,
                    int64_t count, int64_t n_atoms_expected) {
    if (!path || !out || count <= 0) return -1;
    std::FILE* f = std::fopen(path, "rb");
    if (!f) return -2;
    std::vector<char> buf;
    if (!read_record(f, buf) || buf.size() != 84 ||
        std::memcmp(buf.data(), "CORD", 4) != 0) { std::fclose(f); return -3; }
    const int32_t* icntrl = reinterpret_cast<const int32_t*>(buf.data() + 4);
    int32_t cell = icntrl[10];
    if (!read_record(f, buf)) { std::fclose(f); return -3; }
    if (!read_record(f, buf) || buf.size() != 4) { std::fclose(f); return -3; }
    int32_t natoms = 0;
    std::memcpy(&natoms, buf.data(), 4);
    if (natoms != (int32_t)n_atoms_expected) { std::fclose(f); return -5; }

    // skip `start` frames
    for (int64_t fr = 0; fr < start; ++fr) {
        if (cell && !read_record(f, buf)) { std::fclose(f); return -6; }
        for (int d = 0; d < 3; ++d)
            if (!read_record(f, buf)) { std::fclose(f); return -6; }
    }
    for (int64_t fr = 0; fr < count; ++fr) {
        if (cell && !read_record(f, buf)) { std::fclose(f); return -6; }
        float* frame = out + fr * natoms * 3;
        for (int d = 0; d < 3; ++d) {
            if (!read_record(f, buf) || buf.size() != (size_t)(4 * natoms)) {
                std::fclose(f);
                return -6;
            }
            const float* axis = reinterpret_cast<const float*>(buf.data());
            for (int32_t a = 0; a < natoms; ++a) frame[a * 3 + d] = axis[a];
        }
    }
    std::fclose(f);
    return 0;
}

}  // extern "C"
