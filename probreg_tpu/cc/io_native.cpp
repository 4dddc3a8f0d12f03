// Native point-cloud IO: PLY / PCD readers + voxel downsampling.
//
// TPU-native framework runtime component: the reference delegates IO to
// Open3D's C++ (examples/utils.py, tests); this extension is the
// equivalent native data-loader for probreg_tpu, exposed through the
// CPython C API (no pybind11 dependency). probreg_tpu/utils/io.py uses it
// when built (python fallback otherwise).
//
// Build: `make native` at the repo root (setup.py build_ext --inplace).

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
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

PyObject* read_ply_impl(const char* path) {
    std::ifstream f(path, std::ios::binary);
    if (!f) {
        PyErr_Format(PyExc_IOError, "cannot open %s", path);
        return nullptr;
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
                PyErr_SetString(PyExc_ValueError,
                                "list property in vertex element");
                return nullptr;
            }
            ss >> name;
            Prop p{name, type_size(t), type_kind(t)};
            if (p.size < 0) {
                PyErr_Format(PyExc_ValueError, "unknown ply type %s",
                             t.c_str());
                return nullptr;
            }
            props.push_back(p);
        } else if (tok == "end_header") {
            header_done = true;
            break;
        }
    }
    if (!header_done || vertex_count < 0) {
        PyErr_SetString(PyExc_ValueError, "malformed PLY header");
        return nullptr;
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
        PyErr_SetString(PyExc_ValueError, "PLY lacks x/y/z");
        return nullptr;
    }
    std::vector<double> xyz;
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
                PyErr_SetString(PyExc_ValueError, "truncated PLY body");
                return nullptr;
            }
            xyz.push_back(read_scalar(buf.data() + offsets[xi], props[xi], big));
            xyz.push_back(read_scalar(buf.data() + offsets[yi], props[yi], big));
            xyz.push_back(read_scalar(buf.data() + offsets[zi], props[zi], big));
        }
    }
    return make_points_array(xyz);
}

PyObject* read_pcd_impl(const char* path) {
    std::ifstream f(path, std::ios::binary);
    if (!f) {
        PyErr_Format(PyExc_IOError, "cannot open %s", path);
        return nullptr;
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
        PyErr_SetString(PyExc_ValueError, "malformed PCD header");
        return nullptr;
    }
    if (counts.empty()) counts.assign(fields.size(), 1);
    int xi = -1, yi = -1, zi = -1;
    for (size_t i = 0; i < fields.size(); ++i) {
        if (fields[i] == "x") xi = static_cast<int>(i);
        if (fields[i] == "y") yi = static_cast<int>(i);
        if (fields[i] == "z") zi = static_cast<int>(i);
    }
    if (xi < 0 || yi < 0 || zi < 0) {
        PyErr_SetString(PyExc_ValueError, "PCD lacks x/y/z");
        return nullptr;
    }
    std::vector<double> xyz;
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
                PyErr_SetString(PyExc_ValueError, "truncated PCD body");
                return nullptr;
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
        PyErr_Format(PyExc_ValueError, "unsupported PCD DATA kind %s",
                     data_kind.c_str());
        return nullptr;
    }
    return make_points_array(xyz);
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

// ---------------------------------------------------------------- bindings

extern "C" {

static PyObject* py_read_ply(PyObject*, PyObject* args) {
    const char* path;
    if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;
    return read_ply_impl(path);
}

static PyObject* py_read_pcd(PyObject*, PyObject* args) {
    const char* path;
    if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;
    return read_pcd_impl(path);
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
    double mn[3] = {1e300, 1e300, 1e300};
    for (npy_intp i = 0; i < n; ++i)
        for (int d = 0; d < 3; ++d)
            if (p[i * 3 + d] < mn[d]) mn[d] = p[i * 3 + d];
    struct Acc {
        double s[3] = {0, 0, 0};
        long cnt = 0;
        long order = 0;
    };
    std::unordered_map<VoxelKey, Acc, VoxelHash> vox;
    vox.reserve(n);
    long next_order = 0;
    for (npy_intp i = 0; i < n; ++i) {
        VoxelKey k{
            static_cast<int64_t>(std::floor((p[i * 3 + 0] - mn[0]) / voxel)),
            static_cast<int64_t>(std::floor((p[i * 3 + 1] - mn[1]) / voxel)),
            static_cast<int64_t>(std::floor((p[i * 3 + 2] - mn[2]) / voxel))};
        auto it = vox.find(k);
        if (it == vox.end()) {
            it = vox.emplace(k, Acc{}).first;
            it->second.order = next_order++;
        }
        for (int d = 0; d < 3; ++d) it->second.s[d] += p[i * 3 + d];
        it->second.cnt += 1;
    }
    Py_DECREF(arr);
    // Deterministic output order: voxel key lexicographic (matches the
    // python np.unique-based implementation in utils/io.py).
    std::vector<std::pair<VoxelKey, Acc>> items(vox.begin(), vox.end());
    std::sort(items.begin(), items.end(),
              [](const auto& a, const auto& b) {
                  if (a.first.x != b.first.x) return a.first.x < b.first.x;
                  if (a.first.y != b.first.y) return a.first.y < b.first.y;
                  return a.first.z < b.first.z;
              });
    std::vector<double> out;
    out.reserve(items.size() * 3);
    for (const auto& kv : items)
        for (int d = 0; d < 3; ++d)
            out.push_back(kv.second.s[d] / kv.second.cnt);
    return make_points_array(out);
}

static PyMethodDef Methods[] = {
    {"read_ply", py_read_ply, METH_VARARGS, "Read x/y/z from a PLY file."},
    {"read_pcd", py_read_pcd, METH_VARARGS, "Read x/y/z from a PCD file."},
    {"voxel_down_sample", py_voxel_down_sample, METH_VARARGS,
     "Average points per voxel."},
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
