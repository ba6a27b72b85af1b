// Native data-plane for hyperpocket_tpu: fast PLY I/O + parallel batch loading.
//
// The reference's only native code is its CUDA loss extension; its data path
// rides torch's C++ DataLoader. Here the TPU compute path is JAX/Pallas, and
// this library is the native equivalent of the loader: zero-copy binary PLY
// parsing and a std::thread pool that fills a caller-provided batch buffer
// from many PLY files in parallel (the hot path of every training epoch:
// 3 files per item x batch_size, reference datasets/shapenet.py:85-87).
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 dependency).
//
// Build: make -C native   (produces libhpcd.so)

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Property {
  char type;   // 'f' float32, 'd' float64, 'b' i8/u8, 's' i16/u16, 'i' i32/u32
  int size;    // bytes
};

// Parse one whitespace token; returns next position.
size_t next_token(const std::string& line, size_t pos, std::string* out) {
  while (pos < line.size() && isspace(static_cast<unsigned char>(line[pos]))) pos++;
  size_t start = pos;
  while (pos < line.size() && !isspace(static_cast<unsigned char>(line[pos]))) pos++;
  out->assign(line, start, pos - start);
  return pos;
}

int prop_size(const std::string& t) {
  if (t == "float" || t == "float32" || t == "int" || t == "int32" ||
      t == "uint" || t == "uint32")
    return 4;
  if (t == "double" || t == "float64") return 8;
  if (t == "short" || t == "int16" || t == "ushort" || t == "uint16") return 2;
  if (t == "char" || t == "int8" || t == "uchar" || t == "uint8") return 1;
  return -1;
}

// Read the x/y/z float columns of a binary_little_endian PLY.
// Returns 0 on success; fills *points (resized to 3*count) and *count.
int load_ply_xyz(const char* path, std::vector<float>* points, int64_t* count) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;

  // Read header lines (bounded).
  std::string line;
  auto read_line = [&]() -> bool {
    line.clear();
    int c;
    while ((c = fgetc(f)) != EOF) {
      if (c == '\n') return true;
      line.push_back(static_cast<char>(c));
      if (line.size() > 4096) return false;
    }
    return !line.empty();
  };

  if (!read_line() || (line != "ply" && line != "ply\r")) { fclose(f); return -2; }

  bool binary_le = false;
  int64_t vertex_count = -1;
  bool in_vertex = false;
  bool element_before_vertex = false;
  int stride = 0, off_x = -1, off_y = -1, off_z = -1;
  char type_x = 0, type_y = 0, type_z = 0;

  auto coord_type = [](const std::string& t) -> char {
    if (t == "float" || t == "float32") return 'f';
    if (t == "double" || t == "float64") return 'd';
    return 0;  // integer coordinates: not supported natively (numpy fallback)
  };

  while (read_line()) {
    if (!line.empty() && line.back() == '\r') line.pop_back();
    std::string tok;
    size_t pos = next_token(line, 0, &tok);
    if (tok == "end_header") break;
    if (tok == "comment" || tok == "obj_info") continue;
    if (tok == "format") {
      next_token(line, pos, &tok);
      binary_le = (tok == "binary_little_endian");
    } else if (tok == "element") {
      std::string name, cnt;
      pos = next_token(line, pos, &name);
      next_token(line, pos, &cnt);
      in_vertex = (name == "vertex");
      if (in_vertex) vertex_count = strtoll(cnt.c_str(), nullptr, 10);
      else if (vertex_count < 0) element_before_vertex = true;
    } else if (tok == "property" && in_vertex) {
      std::string type, name;
      pos = next_token(line, pos, &type);
      if (type == "list") { fclose(f); return -3; }
      next_token(line, pos, &name);
      int size = prop_size(type);
      if (size < 0) { fclose(f); return -3; }
      if (name == "x") { off_x = stride; type_x = coord_type(type); }
      if (name == "y") { off_y = stride; type_y = coord_type(type); }
      if (name == "z") { off_z = stride; type_z = coord_type(type); }
      stride += size;
    }
  }
  // Strict subset: anything unusual (element before vertex, non-float
  // coordinates, mixed coordinate types) falls back to the numpy parser
  // rather than misreading the payload.
  if (!binary_le || vertex_count < 0 || off_x < 0 || off_y < 0 || off_z < 0 ||
      element_before_vertex || type_x == 0 || type_x != type_y || type_x != type_z) {
    fclose(f);
    return -4;
  }

  std::vector<char> raw(static_cast<size_t>(vertex_count) * stride);
  if (fread(raw.data(), 1, raw.size(), f) != raw.size()) { fclose(f); return -5; }
  fclose(f);

  points->resize(static_cast<size_t>(vertex_count) * 3);
  float* out = points->data();
  const char* base = raw.data();
  if (type_x == 'f') {
    for (int64_t i = 0; i < vertex_count; i++) {
      const char* rec = base + i * stride;
      memcpy(out + 3 * i + 0, rec + off_x, 4);
      memcpy(out + 3 * i + 1, rec + off_y, 4);
      memcpy(out + 3 * i + 2, rec + off_z, 4);
    }
  } else {  // double coordinates
    for (int64_t i = 0; i < vertex_count; i++) {
      const char* rec = base + i * stride;
      double v;
      memcpy(&v, rec + off_x, 8); out[3 * i + 0] = static_cast<float>(v);
      memcpy(&v, rec + off_y, 8); out[3 * i + 1] = static_cast<float>(v);
      memcpy(&v, rec + off_z, 8); out[3 * i + 2] = static_cast<float>(v);
    }
  }
  *count = vertex_count;
  return 0;
}

}  // namespace

extern "C" {

// Single-file API. Caller provides a buffer of capacity*3 floats.
// Returns the vertex count (clamped to capacity), or a negative error code.
int64_t hpcd_load_ply(const char* path, float* out, int64_t capacity) {
  std::vector<float> pts;
  int64_t count = 0;
  int rc = load_ply_xyz(path, &pts, &count);
  if (rc != 0) return rc;
  int64_t n = count < capacity ? count : capacity;
  memcpy(out, pts.data(), static_cast<size_t>(n) * 3 * sizeof(float));
  return n;
}

// Count vertices without reading the payload (for pre-sizing buffers).
int64_t hpcd_ply_vertex_count(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  char buf[4096];
  int64_t count = -1;
  while (fgets(buf, sizeof(buf), f)) {
    if (strncmp(buf, "element vertex", 14) == 0) count = strtoll(buf + 14, nullptr, 10);
    if (strncmp(buf, "end_header", 10) == 0) break;
  }
  fclose(f);
  return count;
}

// Batch API: load `n_files` PLY files in parallel into `out`, a preallocated
// (n_files, points_per_cloud, 3) float32 buffer. Each cloud must have exactly
// points_per_cloud vertices (the framework's fixed-shape contract); clouds
// with a different count poison the batch via the returned error index.
// paths: concatenated NUL-terminated strings.
// Returns 0 on success, or (1 + index) of the first failing file.
int64_t hpcd_load_ply_batch(const char* paths, int64_t n_files,
                            int64_t points_per_cloud, float* out,
                            int64_t n_threads) {
  std::vector<const char*> files(n_files);
  const char* p = paths;
  for (int64_t i = 0; i < n_files; i++) {
    files[i] = p;
    p += strlen(p) + 1;
  }
  if (n_threads <= 0) n_threads = std::thread::hardware_concurrency();
  if (n_threads > n_files) n_threads = n_files;

  std::atomic<int64_t> next(0);
  std::atomic<int64_t> error(0);
  auto worker = [&]() {
    std::vector<float> pts;
    int64_t i;
    while ((i = next.fetch_add(1)) < n_files) {
      if (error.load(std::memory_order_relaxed) != 0) return;
      int64_t count = 0;
      int rc = load_ply_xyz(files[i], &pts, &count);
      if (rc != 0 || count != points_per_cloud) {
        int64_t expected = 0;
        error.compare_exchange_strong(expected, i + 1);
        return;
      }
      memcpy(out + i * points_per_cloud * 3, pts.data(),
             static_cast<size_t>(points_per_cloud) * 3 * sizeof(float));
    }
  };
  std::vector<std::thread> threads;
  for (int64_t t = 0; t < n_threads; t++) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return error.load();
}

// Save (n, 3) float32 points as binary little-endian PLY. 0 on success.
int64_t hpcd_save_ply(const char* path, const float* points, int64_t n) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  fprintf(f,
          "ply\nformat binary_little_endian 1.0\nelement vertex %lld\n"
          "property float x\nproperty float y\nproperty float z\nend_header\n",
          static_cast<long long>(n));
  size_t written = fwrite(points, sizeof(float) * 3, static_cast<size_t>(n), f);
  fclose(f);
  return written == static_cast<size_t>(n) ? 0 : -2;
}

}  // extern "C"
