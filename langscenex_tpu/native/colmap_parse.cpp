// Native COLMAP binary-reconstruction parser.
//
// The reference parses cameras.bin/images.bin/points3D.bin with
// per-record Python struct loops (field_construction/scene/
// colmap_loader.py:126-246); at SfM scale (millions of points, each
// with a variable-length observation track) that is the slowest part
// of scene loading. This C library does one pass of pointer
// arithmetic over the mmap-sized file buffer and fills caller-provided
// numpy arrays through ctypes (no pybind11 in this image).
//
// File layouts (COLMAP binary format spec):
//   points3D.bin: num(u64) then per point: id(u64) xyz(3*f64) rgb(3*u8)
//                 error(f64) track_len(u64) (image_id i32, p2d i32)*len
//   images.bin:   num(u64) then per image: id(i32) qvec(4*f64)
//                 tvec(3*f64) camera_id(i32) name\0 npts(u64)
//                 (x f64, y f64, id u64)*npts
//
// Build: g++ -O3 -shared -fPIC colmap_parse.cpp -o _colmap_parse.so
// (done lazily by langscenex_tpu/native/__init__.py, cached by mtime).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>

namespace {

struct Buf {
    unsigned char* data = nullptr;
    size_t size = 0;
    size_t pos = 0;
    bool ok() const { return data != nullptr; }
    bool have(size_t n) const { return pos + n <= size; }
    template <typename T> bool read(T* out) {
        if (!have(sizeof(T))) return false;
        std::memcpy(out, data + pos, sizeof(T));  // alignment-safe
        pos += sizeof(T);
        return true;
    }
    bool skip(size_t n) {
        if (!have(n)) return false;
        pos += n;
        return true;
    }
};

Buf load_file(const char* path) {
    Buf b;
    FILE* f = std::fopen(path, "rb");
    if (!f) return b;
    std::fseek(f, 0, SEEK_END);
    long sz = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    if (sz < 0) { std::fclose(f); return b; }
    b.data = static_cast<unsigned char*>(std::malloc(sz));
    if (b.data && std::fread(b.data, 1, sz, f) != static_cast<size_t>(sz)) {
        std::free(b.data);
        b.data = nullptr;
    }
    std::fclose(f);
    b.size = static_cast<size_t>(sz);
    return b;
}

}  // namespace

extern "C" {

// Returns the record count in a COLMAP binary file (first u64), or -1.
long long colmap_count(const char* path) {
    Buf b = load_file(path);
    if (!b.ok()) return -1;
    uint64_t n = 0;
    bool ok = b.read(&n);
    std::free(b.data);
    return ok ? static_cast<long long>(n) : -1;
}

// Fills xyz [n,3] f64, rgb [n,3] u8, err [n] f64. Caller sizes the
// arrays from colmap_count(). Returns points parsed, or -1 on a
// truncated/corrupt file.
long long colmap_read_points3d(const char* path, double* xyz,
                               unsigned char* rgb, double* err,
                               long long cap) {
    Buf b = load_file(path);
    if (!b.ok()) return -1;
    uint64_t n = 0;
    if (!b.read(&n) || static_cast<long long>(n) > cap) {
        std::free(b.data);
        return -1;
    }
    long long i = 0;
    for (; i < static_cast<long long>(n); ++i) {
        uint64_t track_len;
        if (!b.skip(8) ||                                  // point id
            !b.have(24 + 3 + 8 + 8)) { i = -1; break; }
        std::memcpy(xyz + 3 * i, b.data + b.pos, 24); b.pos += 24;
        std::memcpy(rgb + 3 * i, b.data + b.pos, 3);  b.pos += 3;
        std::memcpy(err + i, b.data + b.pos, 8);      b.pos += 8;
        b.read(&track_len);
        if (!b.skip(8 * track_len)) { i = -1; break; }     // (img, p2d) i32 pairs
    }
    std::free(b.data);
    return i;
}

// Fills ids [n] i32, qvec [n,4] f64, tvec [n,3] f64, cam_ids [n] i32,
// names [n * name_cap] bytes (zero-padded). Returns images parsed or -1.
long long colmap_read_images(const char* path, int* ids, double* qvec,
                             double* tvec, int* cam_ids, char* names,
                             long long name_cap, long long cap) {
    Buf b = load_file(path);
    if (!b.ok()) return -1;
    uint64_t n = 0;
    if (!b.read(&n) || static_cast<long long>(n) > cap) {
        std::free(b.data);
        return -1;
    }
    long long i = 0;
    for (; i < static_cast<long long>(n); ++i) {
        if (!b.read(ids + i)) { i = -1; break; }
        if (!b.have(32 + 24 + 4)) { i = -1; break; }
        std::memcpy(qvec + 4 * i, b.data + b.pos, 32); b.pos += 32;
        std::memcpy(tvec + 3 * i, b.data + b.pos, 24); b.pos += 24;
        std::memcpy(cam_ids + i, b.data + b.pos, 4);   b.pos += 4;
        // zero-terminated name
        size_t start = b.pos;
        while (b.pos < b.size && b.data[b.pos] != 0) ++b.pos;
        if (b.pos >= b.size) { i = -1; break; }
        size_t len = b.pos - start;
        if (static_cast<long long>(len) >= name_cap) len = name_cap - 1;
        std::memcpy(names + name_cap * i, b.data + start, len);
        ++b.pos;                                           // the \0
        uint64_t npts;
        if (!b.read(&npts) || !b.skip(24 * npts)) { i = -1; break; }
    }
    std::free(b.data);
    return i;
}

}  // extern "C"
