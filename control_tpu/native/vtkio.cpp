// Native I/O runtime for control_tpu.
//
// The reference's solution output runs through Firedrake's VTK/HDF5 C
// libraries (reference control/control.py:593-604).  This module provides
// the native-side equivalent for the TPU rebuild: fast binary
// structured-grid VTK export and raw field checkpointing, callable from
// Python via ctypes (no pybind11 dependency).
//
// Build: `make -C control_tpu/native` (produces libvtkio.so).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

bool is_little_endian() {
    const uint16_t x = 1;
    return *reinterpret_cast<const uint8_t*>(&x) == 1;
}

// VTK legacy binary format is big-endian; swap on LE hosts.
void write_be(FILE* f, const double* data, size_t n) {
    if (!is_little_endian()) {
        fwrite(data, sizeof(double), n, f);
        return;
    }
    std::vector<uint64_t> buf(n);
    std::memcpy(buf.data(), data, n * sizeof(double));
    for (size_t i = 0; i < n; ++i) {
        uint64_t v = buf[i];
        v = ((v & 0x00000000FFFFFFFFull) << 32) | (v >> 32);
        v = ((v & 0x0000FFFF0000FFFFull) << 16) |
            ((v >> 16) & 0x0000FFFF0000FFFFull);
        v = ((v & 0x00FF00FF00FF00FFull) << 8) |
            ((v >> 8) & 0x00FF00FF00FF00FFull);
        buf[i] = v;
    }
    fwrite(buf.data(), sizeof(uint64_t), n, f);
}

}  // namespace

extern "C" {

// Write a structured-grid legacy VTK file (binary).
//   filename        output path
//   nx, ny          node counts
//   x0,x1,y0,y1     domain box (uniform grid)
//   n_fields        number of point-data fields
//   names           field names, ';'-separated
//   comps           per-field component count (1 scalar, 2 vector)
//   data            per-field pointers packed contiguously:
//                   field k occupies ny*nx*comps[k] doubles, C-order
// returns 0 on success.
int vtk_write_structured(const char* filename, int nx, int ny,
                         double x0, double x1, double y0, double y1,
                         int n_fields, const char* names,
                         const int* comps, const double* data) {
    FILE* f = std::fopen(filename, "wb");
    if (!f) return 1;
    std::fprintf(f, "# vtk DataFile Version 3.0\n");
    std::fprintf(f, "control_tpu native output\n");
    std::fprintf(f, "BINARY\nDATASET STRUCTURED_GRID\n");
    std::fprintf(f, "DIMENSIONS %d %d 1\n", nx, ny);
    std::fprintf(f, "POINTS %d double\n", nx * ny);

    const double hx = nx > 1 ? (x1 - x0) / (nx - 1) : 0.0;
    const double hy = ny > 1 ? (y1 - y0) / (ny - 1) : 0.0;
    std::vector<double> pts(static_cast<size_t>(nx) * ny * 3);
    size_t k = 0;
    for (int j = 0; j < ny; ++j) {
        for (int i = 0; i < nx; ++i) {
            pts[k++] = x0 + hx * i;
            pts[k++] = y0 + hy * j;
            pts[k++] = 0.0;
        }
    }
    write_be(f, pts.data(), pts.size());
    std::fprintf(f, "\nPOINT_DATA %d\n", nx * ny);

    // split names
    std::string all(names ? names : "");
    size_t off = 0;
    size_t data_off = 0;
    for (int fi = 0; fi < n_fields; ++fi) {
        size_t semi = all.find(';', off);
        std::string name = all.substr(off, semi == std::string::npos
                                      ? std::string::npos : semi - off);
        off = semi == std::string::npos ? all.size() : semi + 1;
        const size_t n = static_cast<size_t>(nx) * ny;
        if (comps[fi] == 1) {
            std::fprintf(f, "SCALARS %s double 1\nLOOKUP_TABLE default\n",
                         name.c_str());
            write_be(f, data + data_off, n);
            data_off += n;
        } else {
            std::fprintf(f, "VECTORS %s double\n", name.c_str());
            std::vector<double> v3(n * 3, 0.0);
            for (size_t p = 0; p < n; ++p) {
                v3[3 * p] = data[data_off + 2 * p];
                v3[3 * p + 1] = data[data_off + 2 * p + 1];
            }
            write_be(f, v3.data(), v3.size());
            data_off += 2 * n;
        }
        std::fprintf(f, "\n");
    }
    std::fclose(f);
    return 0;
}

// Raw checkpoint stream: [magic, version, ndim, shape..., payload].
// Used for large space-time trajectories where Python-side npz packing
// becomes the bottleneck.
int ckpt_write(const char* filename, const int64_t* shape, int ndim,
               const double* data) {
    FILE* f = std::fopen(filename, "wb");
    if (!f) return 1;
    const uint64_t magic = 0x43545055434B5054ull;  // "CTPUCKPT"
    const uint64_t version = 1;
    fwrite(&magic, 8, 1, f);
    fwrite(&version, 8, 1, f);
    const int64_t nd = ndim;
    fwrite(&nd, 8, 1, f);
    size_t n = 1;
    for (int i = 0; i < ndim; ++i) {
        fwrite(&shape[i], 8, 1, f);
        n *= static_cast<size_t>(shape[i]);
    }
    fwrite(data, sizeof(double), n, f);
    std::fclose(f);
    return 0;
}

int ckpt_read_header(const char* filename, int64_t* shape_out,
                     int max_ndim) {
    FILE* f = std::fopen(filename, "rb");
    if (!f) return -1;
    uint64_t magic = 0, version = 0;
    int64_t nd = 0;
    if (fread(&magic, 8, 1, f) != 1 ||
        magic != 0x43545055434B5054ull ||
        fread(&version, 8, 1, f) != 1 ||
        fread(&nd, 8, 1, f) != 1 || nd > max_ndim) {
        std::fclose(f);
        return -1;
    }
    for (int i = 0; i < nd; ++i) {
        if (fread(&shape_out[i], 8, 1, f) != 1) {
            std::fclose(f);
            return -1;
        }
    }
    std::fclose(f);
    return static_cast<int>(nd);
}

int ckpt_read(const char* filename, double* out, int64_t n) {
    FILE* f = std::fopen(filename, "rb");
    if (!f) return 1;
    int64_t nd = 0;
    std::fseek(f, 16, SEEK_SET);
    if (fread(&nd, 8, 1, f) != 1) { std::fclose(f); return 1; }
    std::fseek(f, 24 + 8 * nd, SEEK_SET);
    const size_t got = fread(out, sizeof(double), static_cast<size_t>(n), f);
    std::fclose(f);
    return got == static_cast<size_t>(n) ? 0 : 1;
}

}  // extern "C"
