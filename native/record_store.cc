// Native reader for the after_tpu sharded record store (see
// after_tpu/dataset/store.py for the on-disk format).  Fills the role LMDB's
// C library plays in the reference (/root/reference/after/dataset/dataset.py:29):
// zero-copy mmap record access for high-throughput data loading.
//
// Exposed as a C ABI for ctypes (after_tpu/dataset/native_store.py):
//   rs_open(path) -> handle
//   rs_count(handle)
//   rs_key(handle, i) -> const char*
//   rs_get(handle, key, &len) -> const uint8_t*  (points into the mmap)
//   rs_get_index(handle, i, &len) -> const uint8_t*
//   rs_close(handle)
//
// Build: g++ -O2 -shared -fPIC -o libafter_record_store.so record_store.cc

#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <unordered_map>
#include <vector>

namespace {

struct Entry {
  uint32_t shard;
  uint64_t offset;
  uint64_t length;
};

struct Mapping {
  const uint8_t* data = nullptr;
  size_t size = 0;
};

struct Store {
  std::string path;
  std::vector<std::string> shard_names;
  std::vector<Mapping> shards;           // lazily mapped
  std::vector<std::string> keys;
  std::vector<Entry> entries;
  std::unordered_map<std::string, size_t> index;
};

bool read_file(const std::string& p, std::vector<uint8_t>* out) {
  int fd = ::open(p.c_str(), O_RDONLY);
  if (fd < 0) return false;
  struct stat st;
  if (fstat(fd, &st) != 0) { ::close(fd); return false; }
  out->resize(st.st_size);
  ssize_t n = ::read(fd, out->data(), st.st_size);
  ::close(fd);
  return n == st.st_size;
}

// minimal JSON string-array extraction for MANIFEST.json "shards"
std::vector<std::string> parse_shards(const std::string& json) {
  std::vector<std::string> out;
  auto pos = json.find("\"shards\"");
  if (pos == std::string::npos) return out;
  pos = json.find('[', pos);
  auto end = json.find(']', pos);
  while (pos < end) {
    auto q1 = json.find('"', pos + 1);
    if (q1 == std::string::npos || q1 > end) break;
    auto q2 = json.find('"', q1 + 1);
    out.push_back(json.substr(q1 + 1, q2 - q1 - 1));
    pos = q2 + 1;
  }
  return out;
}

const Mapping& map_shard(Store* s, uint32_t i) {
  Mapping& m = s->shards[i];
  if (m.data == nullptr) {
    std::string p = s->path + "/" + s->shard_names[i];
    int fd = ::open(p.c_str(), O_RDONLY);
    if (fd >= 0) {
      struct stat st;
      if (fstat(fd, &st) == 0 && st.st_size > 0) {
        void* ptr = ::mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
        if (ptr != MAP_FAILED) {
          m.data = static_cast<const uint8_t*>(ptr);
          m.size = st.st_size;
        }
      }
      ::close(fd);
    }
  }
  return m;
}

}  // namespace

extern "C" {

void* rs_open(const char* path) {
  auto* s = new Store;
  s->path = path;
  std::vector<uint8_t> manifest;
  if (!read_file(s->path + "/MANIFEST.json", &manifest)) {
    delete s;
    return nullptr;
  }
  s->shard_names = parse_shards(
      std::string(manifest.begin(), manifest.end()));
  s->shards.resize(s->shard_names.size());

  std::vector<uint8_t> idx;
  if (!read_file(s->path + "/index.bin", &idx)) {
    delete s;
    return nullptr;
  }
  size_t pos = 0;
  while (pos + 4 <= idx.size()) {
    uint32_t klen;
    std::memcpy(&klen, idx.data() + pos, 4);
    pos += 4;
    if (pos + klen + 20 > idx.size()) break;
    std::string key(reinterpret_cast<const char*>(idx.data() + pos), klen);
    pos += klen;
    Entry e;
    std::memcpy(&e.shard, idx.data() + pos, 4);
    std::memcpy(&e.offset, idx.data() + pos + 4, 8);
    std::memcpy(&e.length, idx.data() + pos + 12, 8);
    pos += 20;
    s->index[key] = s->keys.size();
    s->keys.push_back(std::move(key));
    s->entries.push_back(e);
  }
  return s;
}

int64_t rs_count(void* handle) {
  return static_cast<Store*>(handle)->keys.size();
}

const char* rs_key(void* handle, int64_t i) {
  auto* s = static_cast<Store*>(handle);
  if (i < 0 || i >= static_cast<int64_t>(s->keys.size())) return nullptr;
  return s->keys[i].c_str();
}

const uint8_t* rs_get_index(void* handle, int64_t i, uint64_t* len) {
  auto* s = static_cast<Store*>(handle);
  if (i < 0 || i >= static_cast<int64_t>(s->entries.size())) return nullptr;
  const Entry& e = s->entries[i];
  const Mapping& m = map_shard(s, e.shard);
  if (!m.data || e.offset + e.length > m.size) return nullptr;
  *len = e.length;
  return m.data + e.offset;
}

const uint8_t* rs_get(void* handle, const char* key, uint64_t* len) {
  auto* s = static_cast<Store*>(handle);
  auto it = s->index.find(key);
  if (it == s->index.end()) return nullptr;
  return rs_get_index(handle, it->second, len);
}

void rs_close(void* handle) {
  auto* s = static_cast<Store*>(handle);
  for (auto& m : s->shards) {
    if (m.data) ::munmap(const_cast<uint8_t*>(m.data), m.size);
  }
  delete s;
}

}  // extern "C"
