// Native point-cloud IO: PLY / PCD readers + voxel downsampling + a
// threaded batch loader.
//
// TPU-native framework runtime component: the reference delegates IO to
// Open3D's C++ (examples/utils.py, tests); this extension is the
// equivalent native data-loader for probreg_tpu, exposed through the
// CPython C API (no pybind11 dependency). probreg_tpu/utils/io.py uses it
// when built (python fallback otherwise).
//
// The parsing/downsampling cores are plain C++ (no Python API), so
// read_batch can run them on a std::thread pool with the GIL released —
// the batch loader for TPU serving pipelines (overlap host IO with device
// compute).
//
// Build: `make native` at the repo root (setup.py build_ext --inplace).

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

struct Prop {
    std::string name;
    int size;      // bytes
    char kind;     // 'f' float, 'i' int, 'u' uint
};

int type_size(const std::string& t) {
    if (t == "float" || t == "float32" || t == "int" || t == "int32" ||
        t == "uint" || t == "uint32")
        return 4;
    if (t == "double" || t == "float64") return 8;
    if (t == "short" || t == "ushort" || t == "int16" || t == "uint16")
        return 2;
    if (t == "char" || t == "uchar" || t == "int8" || t == "uint8") return 1;
    return -1;
}

char type_kind(const std::string& t) {
    if (t[0] == 'f' || t == "double") return 'f';
    if (t[0] == 'u') return 'u';
    return 'i';
}

double read_scalar(const char* p, const Prop& prop, bool big_endian) {
    unsigned char buf[8];
    std::memcpy(buf, p, prop.size);
    if (big_endian) {
        for (int i = 0; i < prop.size / 2; ++i)
            std::swap(buf[i], buf[prop.size - 1 - i]);
    }
    if (prop.kind == 'f') {
        if (prop.size == 4) {
            float v;
            std::memcpy(&v, buf, 4);
            return v;
        }
        double v;
        std::memcpy(&v, buf, 8);
        return v;
    }
    if (prop.kind == 'u') {
        uint64_t uv = 0;
        std::memcpy(&uv, buf, prop.size);
        return static_cast<double>(uv);
    }
    // Signed: sign-extend from prop.size bytes.
    int64_t iv = 0;
    std::memcpy(&iv, buf, prop.size);
    const int shift = 64 - 8 * prop.size;
    iv = (iv << shift) >> shift;
    return static_cast<double>(iv);
}

PyObject* make_points_array(const std::vector<double>& xyz) {
    npy_intp dims[2] = {static_cast<npy_intp>(xyz.size() / 3), 3};
    PyObject* arr = PyArray_SimpleNew(2, dims, NPY_FLOAT64);
    if (!arr) return nullptr;
    std::memcpy(PyArray_DATA(reinterpret_cast<PyArrayObject*>(arr)),
                xyz.data(), xyz.size() * sizeof(double));
    return arr;
}

// ------------------------------------------------- GIL-free parsing cores

bool read_ply_core(const char* path, std::vector<double>& xyz,
                   std::string& err) {
    std::ifstream f(path, std::ios::binary);
    if (!f) {
        err = std::string("cannot open ") + path;
        return false;
    }
    std::string line, format;
    long vertex_count = -1;
    std::vector<Prop> props;
    bool in_vertex = false;
    bool header_done = false;
    while (std::getline(f, line)) {
        if (!line.empty() && line.back() == '\r') line.pop_back();
        std::istringstream ss(line);
        std::string tok;
        ss >> tok;
        if (tok == "format") {
            ss >> format;
        } else if (tok == "element") {
            std::string name;
            long cnt;
            ss >> name >> cnt;
            in_vertex = (name == "vertex");
            if (in_vertex) vertex_count = cnt;
        } else if (tok == "property" && in_vertex) {
            std::string t, name;
            ss >> t;
            if (t == "list") {
                err = "list property in vertex element";
                return false;
            }
            ss >> name;
            Prop p{name, type_size(t), type_kind(t)};
            if (p.size < 0) {
                err = "unknown ply type " + t;
                return false;
            }
            props.push_back(p);
        } else if (tok == "end_header") {
            header_done = true;
            break;
        }
    }
    if (!header_done || vertex_count < 0) {
        err = "malformed PLY header";
        return false;
    }
    int xi = -1, yi = -1, zi = -1, stride = 0;
    std::vector<int> offsets(props.size());
    for (size_t i = 0; i < props.size(); ++i) {
        offsets[i] = stride;
        stride += props[i].size;
        if (props[i].name == "x") xi = static_cast<int>(i);
        if (props[i].name == "y") yi = static_cast<int>(i);
        if (props[i].name == "z") zi = static_cast<int>(i);
    }
    if (xi < 0 || yi < 0 || zi < 0) {
        err = "PLY lacks x/y/z";
        return false;
    }
    xyz.clear();
    xyz.reserve(vertex_count * 3);
    if (format == "ascii") {
        for (long i = 0; i < vertex_count; ++i) {
            std::vector<double> row(props.size());
            for (size_t j = 0; j < props.size(); ++j) f >> row[j];
            xyz.push_back(row[xi]);
            xyz.push_back(row[yi]);
            xyz.push_back(row[zi]);
        }
    } else {
        bool big = format == "binary_big_endian";
        std::vector<char> buf(stride);
        for (long i = 0; i < vertex_count; ++i) {
            f.read(buf.data(), stride);
            if (!f) {
                err = "truncated PLY body";
                return false;
            }
            xyz.push_back(read_scalar(buf.data() + offsets[xi], props[xi], big));
            xyz.push_back(read_scalar(buf.data() + offsets[yi], props[yi], big));
            xyz.push_back(read_scalar(buf.data() + offsets[zi], props[zi], big));
        }
    }
    return true;
}

bool read_pcd_core(const char* path, std::vector<double>& xyz,
                   std::string& err) {
    std::ifstream f(path, std::ios::binary);
    if (!f) {
        err = std::string("cannot open ") + path;
        return false;
    }
    std::string line;
    std::vector<std::string> fields;
    std::vector<int> sizes, counts;
    std::vector<std::string> types;
    long n_points = -1;
    std::string data_kind;
    while (std::getline(f, line)) {
        if (!line.empty() && line.back() == '\r') line.pop_back();
        std::istringstream ss(line);
        std::string tok;
        ss >> tok;
        if (tok == "FIELDS") {
            std::string v;
            while (ss >> v) fields.push_back(v);
        } else if (tok == "SIZE") {
            int v;
            while (ss >> v) sizes.push_back(v);
        } else if (tok == "TYPE") {
            std::string v;
            while (ss >> v) types.push_back(v);
        } else if (tok == "COUNT") {
            int v;
            while (ss >> v) counts.push_back(v);
        } else if (tok == "POINTS") {
            ss >> n_points;
        } else if (tok == "DATA") {
            ss >> data_kind;
            break;
        }
    }
    if (n_points < 0 || fields.empty()) {
        err = "malformed PCD header";
        return false;
    }
    if (counts.empty()) counts.assign(fields.size(), 1);
    int xi = -1, yi = -1, zi = -1;
    for (size_t i = 0; i < fields.size(); ++i) {
        if (fields[i] == "x") xi = static_cast<int>(i);
        if (fields[i] == "y") yi = static_cast<int>(i);
        if (fields[i] == "z") zi = static_cast<int>(i);
    }
    if (xi < 0 || yi < 0 || zi < 0) {
        err = "PCD lacks x/y/z";
        return false;
    }
    xyz.clear();
    xyz.reserve(n_points * 3);
    if (data_kind == "ascii") {
        size_t ncols = 0;
        for (size_t i = 0; i < fields.size(); ++i) ncols += counts[i];
        std::vector<size_t> col_of(fields.size());
        size_t c = 0;
        for (size_t i = 0; i < fields.size(); ++i) {
            col_of[i] = c;
            c += counts[i];
        }
        std::vector<double> row(ncols);
        for (long i = 0; i < n_points; ++i) {
            for (size_t j = 0; j < ncols; ++j) f >> row[j];
            xyz.push_back(row[col_of[xi]]);
            xyz.push_back(row[col_of[yi]]);
            xyz.push_back(row[col_of[zi]]);
        }
    } else if (data_kind == "binary") {
        int stride = 0;
        std::vector<int> offs(fields.size());
        for (size_t i = 0; i < fields.size(); ++i) {
            offs[i] = stride;
            stride += sizes[i] * counts[i];
        }
        std::vector<char> buf(stride);
        for (long i = 0; i < n_points; ++i) {
            f.read(buf.data(), stride);
            if (!f) {
                err = "truncated PCD body";
                return false;
            }
            int idxs[3] = {xi, yi, zi};
            for (int k = 0; k < 3; ++k) {
                Prop p{"", sizes[idxs[k]], type_kind(
                    types[idxs[k]] == "F" ? std::string("float")
                    : types[idxs[k]] == "U" ? std::string("uint")
                    : std::string("int"))};
                xyz.push_back(read_scalar(buf.data() + offs[idxs[k]], p, false));
            }
        }
    } else {
        err = "unsupported PCD DATA kind " + data_kind;
        return false;
    }
    return true;
}

bool read_cloud_core(const std::string& path, std::vector<double>& xyz,
                     std::string& err) {
    auto dot = path.rfind('.');
    std::string ext = dot == std::string::npos ? "" : path.substr(dot);
    for (auto& c : ext) c = static_cast<char>(std::tolower(c));
    if (ext == ".ply") return read_ply_core(path.c_str(), xyz, err);
    if (ext == ".pcd") return read_pcd_core(path.c_str(), xyz, err);
    err = "unsupported extension for " + path + " (want .ply/.pcd)";
    return false;
}

struct VoxelKey {
    int64_t x, y, z;
    bool operator==(const VoxelKey& o) const {
        return x == o.x && y == o.y && z == o.z;
    }
};

struct VoxelHash {
    size_t operator()(const VoxelKey& k) const {
        size_t h = std::hash<int64_t>()(k.x);
        h ^= std::hash<int64_t>()(k.y) + 0x9e3779b97f4a7c15ull + (h << 6) + (h >> 2);
        h ^= std::hash<int64_t>()(k.z) + 0x9e3779b97f4a7c15ull + (h << 6) + (h >> 2);
        return h;
    }
};

void voxel_core(const double* p, long n, double voxel,
                std::vector<double>& out) {
    double mn[3] = {1e300, 1e300, 1e300};
    for (long i = 0; i < n; ++i)
        for (int d = 0; d < 3; ++d)
            if (p[i * 3 + d] < mn[d]) mn[d] = p[i * 3 + d];
    struct Acc {
        double s[3] = {0, 0, 0};
        long cnt = 0;
    };
    std::unordered_map<VoxelKey, Acc, VoxelHash> vox;
    vox.reserve(n);
    for (long i = 0; i < n; ++i) {
        VoxelKey k{
            static_cast<int64_t>(std::floor((p[i * 3 + 0] - mn[0]) / voxel)),
            static_cast<int64_t>(std::floor((p[i * 3 + 1] - mn[1]) / voxel)),
            static_cast<int64_t>(std::floor((p[i * 3 + 2] - mn[2]) / voxel))};
        auto& a = vox[k];
        for (int d = 0; d < 3; ++d) a.s[d] += p[i * 3 + d];
        a.cnt += 1;
    }
    // Deterministic output order: voxel key lexicographic (matches the
    // python np.unique-based implementation in utils/io.py).
    std::vector<std::pair<VoxelKey, Acc>> items(vox.begin(), vox.end());
    std::sort(items.begin(), items.end(),
              [](const auto& a, const auto& b) {
                  if (a.first.x != b.first.x) return a.first.x < b.first.x;
                  if (a.first.y != b.first.y) return a.first.y < b.first.y;
                  return a.first.z < b.first.z;
              });
    out.clear();
    out.reserve(items.size() * 3);
    for (const auto& kv : items)
        for (int d = 0; d < 3; ++d)
            out.push_back(kv.second.s[d] / kv.second.cnt);
}

// ---------------------------------------------------------------- bindings

extern "C" {

static PyObject* py_read_ply(PyObject*, PyObject* args) {
    const char* path;
    if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;
    std::vector<double> xyz;
    std::string err;
    bool ok;
    Py_BEGIN_ALLOW_THREADS
    ok = read_ply_core(path, xyz, err);
    Py_END_ALLOW_THREADS
    if (!ok) {
        PyErr_SetString(err.rfind("cannot open", 0) == 0 ? PyExc_IOError
                                                         : PyExc_ValueError,
                        err.c_str());
        return nullptr;
    }
    return make_points_array(xyz);
}

static PyObject* py_read_pcd(PyObject*, PyObject* args) {
    const char* path;
    if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;
    std::vector<double> xyz;
    std::string err;
    bool ok;
    Py_BEGIN_ALLOW_THREADS
    ok = read_pcd_core(path, xyz, err);
    Py_END_ALLOW_THREADS
    if (!ok) {
        PyErr_SetString(err.rfind("cannot open", 0) == 0 ? PyExc_IOError
                                                         : PyExc_ValueError,
                        err.c_str());
        return nullptr;
    }
    return make_points_array(xyz);
}

static PyObject* py_voxel_down_sample(PyObject*, PyObject* args) {
    PyObject* obj;
    double voxel;
    if (!PyArg_ParseTuple(args, "Od", &obj, &voxel)) return nullptr;
    PyArrayObject* arr = reinterpret_cast<PyArrayObject*>(
        PyArray_FROM_OTF(obj, NPY_FLOAT64, NPY_ARRAY_C_CONTIGUOUS));
    if (!arr) return nullptr;
    if (PyArray_NDIM(arr) != 2 || PyArray_DIM(arr, 1) != 3) {
        Py_DECREF(arr);
        PyErr_SetString(PyExc_ValueError, "expected (N, 3) array");
        return nullptr;
    }
    const npy_intp n = PyArray_DIM(arr, 0);
    const double* p = static_cast<double*>(PyArray_DATA(arr));
    std::vector<double> out;
    Py_BEGIN_ALLOW_THREADS
    voxel_core(p, static_cast<long>(n), voxel, out);
    Py_END_ALLOW_THREADS
    Py_DECREF(arr);
    return make_points_array(out);
}

// read_batch(paths, voxel=0.0, threads=0) -> list[ndarray]
//
// Threaded batch loader: parses (and optionally voxel-downsamples) every
// file on a std::thread pool with the GIL released. threads=0 picks
// min(len(paths), hardware_concurrency). Raises on the first failing file
// (with its path in the message).
static PyObject* py_read_batch(PyObject*, PyObject* args) {
    PyObject* seq_obj;
    double voxel = 0.0;
    int threads = 0;
    if (!PyArg_ParseTuple(args, "O|di", &seq_obj, &voxel, &threads))
        return nullptr;
    PyObject* seq = PySequence_Fast(seq_obj, "read_batch expects a sequence");
    if (!seq) return nullptr;
    const Py_ssize_t n = PySequence_Fast_GET_SIZE(seq);
    std::vector<std::string> paths(n);
    for (Py_ssize_t i = 0; i < n; ++i) {
        PyObject* it = PySequence_Fast_GET_ITEM(seq, i);
        PyObject* s = PyObject_Str(it);
        if (!s) {
            Py_DECREF(seq);
            return nullptr;
        }
        const char* c = PyUnicode_AsUTF8(s);
        if (!c) {
            Py_DECREF(s);
            Py_DECREF(seq);
            return nullptr;
        }
        paths[i] = c;
        Py_DECREF(s);
    }
    Py_DECREF(seq);

    std::vector<std::vector<double>> results(n);
    std::vector<std::string> errs(n);
    std::atomic<long> next(0);
    int nthreads = threads > 0 ? threads
                               : static_cast<int>(std::min<Py_ssize_t>(
                                     n, std::max(1u, std::thread::hardware_concurrency())));

    Py_BEGIN_ALLOW_THREADS
    {
        auto worker = [&]() {
            for (;;) {
                long i = next.fetch_add(1);
                if (i >= n) break;
                std::vector<double> xyz;
                if (!read_cloud_core(paths[i], xyz, errs[i])) continue;
                if (voxel > 0.0 && !xyz.empty()) {
                    std::vector<double> ds;
                    voxel_core(xyz.data(),
                               static_cast<long>(xyz.size() / 3), voxel, ds);
                    results[i] = std::move(ds);
                } else {
                    results[i] = std::move(xyz);
                }
            }
        };
        std::vector<std::thread> pool;
        pool.reserve(nthreads);
        for (int t = 0; t < nthreads; ++t) pool.emplace_back(worker);
        for (auto& t : pool) t.join();
    }
    Py_END_ALLOW_THREADS

    for (Py_ssize_t i = 0; i < n; ++i) {
        if (!errs[i].empty()) {
            PyErr_Format(PyExc_ValueError, "%s: %s", paths[i].c_str(),
                         errs[i].c_str());
            return nullptr;
        }
    }
    PyObject* out = PyList_New(n);
    if (!out) return nullptr;
    for (Py_ssize_t i = 0; i < n; ++i) {
        PyObject* arr = make_points_array(results[i]);
        if (!arr) {
            Py_DECREF(out);
            return nullptr;
        }
        PyList_SET_ITEM(out, i, arr);
    }
    return out;
}

// morton_order(points) -> int64 permutation sorting (N, 2|3) f32 points
// into Z-order. Bit-identical to ops/spatial.morton_order_np (same f32
// quantization, same bit spreading, stable sort) but a 15-bit-radix LSD
// counting sort instead of np.argsort — O(N) vs O(N log N), ~4-6x faster
// at 1M points. Runs once per registration/pyramid level before the
// tile-culled kernels (the sort must never run per EM iteration).
static void morton_core(const float* p, long n, int dim,
                        std::vector<int64_t>& order) {
    const int bits = dim >= 3 ? 10 : 15;
    const float scale = static_cast<float>((1 << bits) - 1);
    float lo[3], hi[3];
    for (int d = 0; d < dim; ++d) { lo[d] = hi[d] = p[d]; }
    for (long i = 1; i < n; ++i)
        for (int d = 0; d < dim; ++d) {
            const float v = p[i * dim + d];
            if (v < lo[d]) lo[d] = v;
            if (v > hi[d]) hi[d] = v;
        }
    float span[3];
    const float tiny = 1.1754944e-38f;  // FLT_MIN (matches np tiny)
    for (int d = 0; d < dim; ++d)
        span[d] = std::max(hi[d] - lo[d], tiny);

    auto spread = [bits](uint32_t x, int step) {
        uint32_t out = 0;
        for (int b = 0; b < bits; ++b)
            out |= ((x >> b) & 1u) << (b * step);
        return out;
    };
    std::vector<uint32_t> code(n);
    for (long i = 0; i < n; ++i) {
        uint32_t c = 0;
        for (int d = 0; d < dim; ++d) {
            float q = (p[i * dim + d] - lo[d]) / span[d] * scale;
            if (q < 0.0f) q = 0.0f;
            if (q > scale) q = scale;
            c |= spread(static_cast<uint32_t>(q), dim) << d;
        }
        code[i] = c;
    }
    // Two stable 15-bit LSD counting passes over (code, index).
    order.resize(n);
    std::vector<int64_t> tmp(n);
    std::vector<uint32_t> ctmp(n);
    for (long i = 0; i < n; ++i) order[i] = i;
    const int RB = 15;
    const uint32_t mask = (1u << RB) - 1u;
    std::vector<long> cnt(1 << RB);
    for (int pass = 0; pass < 2; ++pass) {
        const int shift = pass * RB;
        std::fill(cnt.begin(), cnt.end(), 0);
        for (long i = 0; i < n; ++i) ++cnt[(code[i] >> shift) & mask];
        long run = 0;
        for (size_t b = 0; b < cnt.size(); ++b) {
            const long c = cnt[b];
            cnt[b] = run;
            run += c;
        }
        for (long i = 0; i < n; ++i) {
            const long pos = cnt[(code[i] >> shift) & mask]++;
            tmp[pos] = order[i];
            ctmp[pos] = code[i];
        }
        order.swap(tmp);
        code.swap(ctmp);
    }
}

static PyObject* py_morton_order(PyObject*, PyObject* args) {
    PyObject* obj;
    if (!PyArg_ParseTuple(args, "O", &obj)) return nullptr;
    PyArrayObject* arr = reinterpret_cast<PyArrayObject*>(
        PyArray_FROM_OTF(obj, NPY_FLOAT32, NPY_ARRAY_C_CONTIGUOUS));
    if (!arr) return nullptr;
    if (PyArray_NDIM(arr) != 2 ||
        (PyArray_DIM(arr, 1) != 2 && PyArray_DIM(arr, 1) != 3)) {
        Py_DECREF(arr);
        PyErr_SetString(PyExc_ValueError, "expected (N, 2|3) array");
        return nullptr;
    }
    const npy_intp n = PyArray_DIM(arr, 0);
    const int dim = static_cast<int>(PyArray_DIM(arr, 1));
    const float* p = static_cast<float*>(PyArray_DATA(arr));
    std::vector<int64_t> order;
    if (n > 0) {
        Py_BEGIN_ALLOW_THREADS
        morton_core(p, static_cast<long>(n), dim, order);
        Py_END_ALLOW_THREADS
    }
    Py_DECREF(arr);
    npy_intp dims[1] = {n};
    PyObject* out = PyArray_SimpleNew(1, dims, NPY_INT64);
    if (!out) return nullptr;
    std::memcpy(PyArray_DATA(reinterpret_cast<PyArrayObject*>(out)),
                order.data(), sizeof(int64_t) * n);
    return out;
}

static PyMethodDef Methods[] = {
    {"read_ply", py_read_ply, METH_VARARGS, "Read x/y/z from a PLY file."},
    {"read_pcd", py_read_pcd, METH_VARARGS, "Read x/y/z from a PCD file."},
    {"voxel_down_sample", py_voxel_down_sample, METH_VARARGS,
     "Average points per voxel."},
    {"read_batch", py_read_batch, METH_VARARGS,
     "Threaded batch loader: read_batch(paths, voxel=0.0, threads=0)."},
    {"morton_order", py_morton_order, METH_VARARGS,
     "Z-order permutation of (N, 2|3) points (radix sort)."},
    {nullptr, nullptr, 0, nullptr}};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_io_native",
    "Native PLY/PCD IO + voxel downsampling for probreg_tpu.", -1, Methods};

PyMODINIT_FUNC PyInit__io_native(void) {
    import_array();
    return PyModule_Create(&moduledef);
}

}  // extern "C"

}  // namespace
