// Pure-C++ reader for TF object-based checkpoints (TensorBundle format).
//
// Native counterpart of epnn_tpu/io/bundle_reader.py (the authoritative
// format notes live there): parses the leveldb-style immutable table in
// <prefix>.index — prefix-compressed key/value blocks with a 1-byte
// compression tag (raw snappy supported) — decodes the BundleEntryProto
// values (dtype/shape/shard/offset/size), and maps tensor bytes out of the
// .data-SSSSS-of-NNNNN shards.  Exposed through a flat C ABI consumed via
// ctypes (epnn_tpu/io/bundle_native.py); no TensorFlow, no Python, no
// dependencies beyond the C++17 standard library.
//
// Reference checkpoints this reads: /root/reference/models/*_weights.*
// (plain dense tensors only — no slices, matching the Python reader).

#include <cstdint>
#include <cstring>
#include <fstream>
#include <memory>
#include <string>
#include <vector>

namespace {

constexpr uint64_t kTableMagic = 0xdb4775248b80fb57ull;
constexpr size_t kFooterSize = 48;

thread_local std::string g_error;

struct Tensor {
  std::string name;
  int dtype = 0;                 // TF DataType enum value
  std::vector<long long> shape;
  int shard_id = 0;
  uint64_t offset = 0;
  uint64_t size = 0;
  const uint8_t* data = nullptr;  // into Bundle::shards
};

struct Bundle {
  std::vector<Tensor> tensors;
  std::vector<std::vector<uint8_t>> shards;
};

bool ReadFile(const std::string& path, std::vector<uint8_t>* out) {
  std::ifstream f(path, std::ios::binary | std::ios::ate);
  if (!f) return false;
  auto size = f.tellg();
  out->resize(static_cast<size_t>(size));
  f.seekg(0);
  f.read(reinterpret_cast<char*>(out->data()), size);
  return static_cast<bool>(f);
}

// -- varint ------------------------------------------------------------
bool Varint(const uint8_t* buf, size_t len, size_t* pos, uint64_t* out) {
  uint64_t result = 0;
  int shift = 0;
  while (*pos < len) {
    uint8_t b = buf[(*pos)++];
    result |= static_cast<uint64_t>(b & 0x7f) << shift;
    if (!(b & 0x80)) {
      *out = result;
      return true;
    }
    shift += 7;
    if (shift > 63) break;
  }
  g_error = "varint overruns buffer";
  return false;
}

// -- raw snappy (no framing) -------------------------------------------
bool SnappyDecompress(const uint8_t* in, size_t len, std::vector<uint8_t>* out) {
  size_t pos = 0;
  uint64_t total = 0;
  if (!Varint(in, len, &pos, &total)) return false;
  out->clear();
  out->reserve(total);
  while (pos < len) {
    uint8_t tag = in[pos++];
    int kind = tag & 0x3;
    if (kind == 0) {  // literal
      uint64_t size = (tag >> 2) + 1;
      if (size > 60) {
        int nbytes = static_cast<int>(size) - 60;
        if (pos + nbytes > len) { g_error = "snappy literal overrun"; return false; }
        uint64_t s = 0;
        for (int i = 0; i < nbytes; i++) s |= static_cast<uint64_t>(in[pos + i]) << (8 * i);
        size = s + 1;
        pos += nbytes;
      }
      if (pos + size > len) { g_error = "snappy literal overrun"; return false; }
      out->insert(out->end(), in + pos, in + pos + size);
      pos += size;
    } else {
      uint64_t size, offset;
      if (kind == 1) {
        size = ((tag >> 2) & 0x7) + 4;
        if (pos >= len) { g_error = "snappy copy overrun"; return false; }
        offset = (static_cast<uint64_t>(tag >> 5) << 8) | in[pos];
        pos += 1;
      } else if (kind == 2) {
        size = (tag >> 2) + 1;
        if (pos + 2 > len) { g_error = "snappy copy overrun"; return false; }
        offset = in[pos] | (in[pos + 1] << 8);
        pos += 2;
      } else {
        size = (tag >> 2) + 1;
        if (pos + 4 > len) { g_error = "snappy copy overrun"; return false; }
        offset = 0;
        for (int i = 0; i < 4; i++) offset |= static_cast<uint64_t>(in[pos + i]) << (8 * i);
        pos += 4;
      }
      if (offset == 0 || offset > out->size()) { g_error = "bad snappy offset"; return false; }
      size_t start = out->size() - offset;
      for (uint64_t i = 0; i < size; i++) out->push_back((*out)[start + i]);  // may overlap
    }
  }
  if (out->size() != total) { g_error = "snappy length mismatch"; return false; }
  return true;
}

// -- table block: [data, 1-byte compression tag, crc32] ------------------
bool ReadBlock(const std::vector<uint8_t>& file, uint64_t offset, uint64_t size,
               std::vector<uint8_t>* out) {
  if (offset + size + 1 > file.size()) { g_error = "block overruns index file"; return false; }
  uint8_t compression = file[offset + size];
  if (compression == 0) {
    out->assign(file.begin() + offset, file.begin() + offset + size);
    return true;
  }
  if (compression == 1) return SnappyDecompress(file.data() + offset, size, out);
  g_error = "unsupported block compression " + std::to_string(compression);
  return false;
}

// prefix-compressed key/value entries of one block
bool IterBlock(const std::vector<uint8_t>& block,
               std::vector<std::pair<std::string, std::vector<uint8_t>>>* out) {
  if (block.size() < 4) return true;
  uint32_t num_restarts;
  std::memcpy(&num_restarts, block.data() + block.size() - 4, 4);
  if (4ull * (num_restarts + 1) > block.size()) { g_error = "bad restart count"; return false; }
  size_t data_end = block.size() - 4 * (num_restarts + 1);
  size_t pos = 0;
  std::string key;
  while (pos < data_end) {
    uint64_t shared, unshared, value_len;
    if (!Varint(block.data(), data_end, &pos, &shared) ||
        !Varint(block.data(), data_end, &pos, &unshared) ||
        !Varint(block.data(), data_end, &pos, &value_len))
      return false;
    if (shared > key.size() || pos + unshared + value_len > block.size()) {
      g_error = "corrupt block entry";
      return false;
    }
    key.resize(shared);
    key.append(reinterpret_cast<const char*>(block.data() + pos), unshared);
    pos += unshared;
    out->emplace_back(key, std::vector<uint8_t>(block.begin() + pos,
                                                block.begin() + pos + value_len));
    pos += value_len;
  }
  return true;
}

// -- minimal protobuf walk ----------------------------------------------
struct ProtoField {
  int field;
  int wire;
  uint64_t varint;
  const uint8_t* bytes;
  size_t len;
};

bool ProtoFields(const uint8_t* buf, size_t len, std::vector<ProtoField>* out) {
  size_t pos = 0;
  while (pos < len) {
    uint64_t tag;
    if (!Varint(buf, len, &pos, &tag)) return false;
    ProtoField f;
    f.field = static_cast<int>(tag >> 3);
    f.wire = static_cast<int>(tag & 0x7);
    f.varint = 0;
    f.bytes = nullptr;
    f.len = 0;
    if (f.wire == 0) {
      if (!Varint(buf, len, &pos, &f.varint)) return false;
    } else if (f.wire == 1) {
      if (pos + 8 > len) { g_error = "proto fixed64 overrun"; return false; }
      std::memcpy(&f.varint, buf + pos, 8);
      pos += 8;
    } else if (f.wire == 2) {
      uint64_t ln;
      if (!Varint(buf, len, &pos, &ln)) return false;
      if (pos + ln > len) { g_error = "proto bytes overrun"; return false; }
      f.bytes = buf + pos;
      f.len = ln;
      pos += ln;
    } else if (f.wire == 5) {
      uint32_t v = 0;
      if (pos + 4 > len) { g_error = "proto fixed32 overrun"; return false; }
      std::memcpy(&v, buf + pos, 4);
      f.varint = v;
      pos += 4;
    } else {
      g_error = "unsupported wire type " + std::to_string(f.wire);
      return false;
    }
    out->push_back(f);
  }
  return true;
}

bool ParseShape(const uint8_t* buf, size_t len, std::vector<long long>* dims) {
  std::vector<ProtoField> fields;
  if (!ProtoFields(buf, len, &fields)) return false;
  for (const auto& f : fields) {
    if (f.field == 2 && f.wire == 2) {  // TensorShapeProto.dim
      std::vector<ProtoField> sub;
      if (!ProtoFields(f.bytes, f.len, &sub)) return false;
      long long size = 0;
      for (const auto& s : sub)
        if (s.field == 1) size = static_cast<long long>(s.varint);
      dims->push_back(size);
    } else if (f.field == 3 && f.varint) {
      g_error = "unknown-rank tensor shape";
      return false;
    }
  }
  return true;
}

bool ParseEntry(const std::vector<uint8_t>& value, Tensor* t, int* num_shards_out) {
  std::vector<ProtoField> fields;
  if (!ProtoFields(value.data(), value.size(), &fields)) return false;
  for (const auto& f : fields) {
    switch (f.field) {
      case 1: t->dtype = static_cast<int>(f.varint); break;
      case 2:
        if (!ParseShape(f.bytes, f.len, &t->shape)) return false;
        break;
      case 3: t->shard_id = static_cast<int>(f.varint); break;
      case 4: t->offset = f.varint; break;
      case 5: t->size = f.varint; break;
      case 7: g_error = "sliced tensors not supported"; return false;
      default: break;
    }
  }
  (void)num_shards_out;
  return true;
}

Bundle* OpenBundle(const std::string& prefix) {
  std::vector<uint8_t> index;
  if (!ReadFile(prefix + ".index", &index)) {
    g_error = "cannot read " + prefix + ".index";
    return nullptr;
  }
  if (index.size() < kFooterSize) { g_error = "index file too small"; return nullptr; }
  const uint8_t* footer = index.data() + index.size() - kFooterSize;
  uint64_t magic;
  std::memcpy(&magic, footer + kFooterSize - 8, 8);
  if (magic != kTableMagic) { g_error = "bad table magic"; return nullptr; }

  size_t pos = 0;
  uint64_t meta_off, meta_size, index_off, index_size;
  if (!Varint(footer, kFooterSize, &pos, &meta_off) ||
      !Varint(footer, kFooterSize, &pos, &meta_size) ||
      !Varint(footer, kFooterSize, &pos, &index_off) ||
      !Varint(footer, kFooterSize, &pos, &index_size))
    return nullptr;

  std::vector<uint8_t> index_block;
  if (!ReadBlock(index, index_off, index_size, &index_block)) return nullptr;
  std::vector<std::pair<std::string, std::vector<uint8_t>>> handles;
  if (!IterBlock(index_block, &handles)) return nullptr;

  auto bundle = std::make_unique<Bundle>();
  int num_shards = 1;
  for (const auto& kv : handles) {
    size_t hpos = 0;
    uint64_t block_off, block_size;
    if (!Varint(kv.second.data(), kv.second.size(), &hpos, &block_off) ||
        !Varint(kv.second.data(), kv.second.size(), &hpos, &block_size))
      return nullptr;
    std::vector<uint8_t> block;
    if (!ReadBlock(index, block_off, block_size, &block)) return nullptr;
    std::vector<std::pair<std::string, std::vector<uint8_t>>> entries;
    if (!IterBlock(block, &entries)) return nullptr;
    for (auto& kv2 : entries) {
      if (kv2.first.empty()) {  // BundleHeaderProto
        std::vector<ProtoField> fields;
        if (!ProtoFields(kv2.second.data(), kv2.second.size(), &fields)) return nullptr;
        for (const auto& f : fields)
          if (f.field == 1) num_shards = static_cast<int>(f.varint);
        continue;
      }
      Tensor t;
      t.name = kv2.first;
      if (!ParseEntry(kv2.second, &t, &num_shards)) return nullptr;
      bundle->tensors.push_back(std::move(t));
    }
  }
  if (bundle->tensors.empty()) { g_error = "empty bundle index"; return nullptr; }

  // load shards and wire data pointers
  int max_shard = 0;
  for (const auto& t : bundle->tensors)
    if (t.shard_id > max_shard) max_shard = t.shard_id;
  bundle->shards.resize(max_shard + 1);
  for (auto& t : bundle->tensors) {
    auto& shard = bundle->shards[t.shard_id];
    if (shard.empty()) {
      char name[64];
      std::snprintf(name, sizeof(name), ".data-%05d-of-%05d", t.shard_id, num_shards);
      if (!ReadFile(prefix + name, &shard)) {
        g_error = "missing shard " + prefix + name;
        return nullptr;
      }
    }
    if (t.offset + t.size > shard.size()) { g_error = "tensor overruns shard"; return nullptr; }
    t.data = shard.data() + t.offset;
  }
  return bundle.release();
}

}  // namespace

extern "C" {

void* epnn_bundle_open(const char* prefix) {
  g_error.clear();
  return OpenBundle(prefix);
}

int epnn_bundle_count(void* h) {
  return static_cast<int>(static_cast<Bundle*>(h)->tensors.size());
}

const char* epnn_bundle_name(void* h, int i) {
  return static_cast<Bundle*>(h)->tensors[i].name.c_str();
}

int epnn_bundle_dtype(void* h, int i) {
  return static_cast<Bundle*>(h)->tensors[i].dtype;
}

int epnn_bundle_rank(void* h, int i) {
  return static_cast<int>(static_cast<Bundle*>(h)->tensors[i].shape.size());
}

const long long* epnn_bundle_shape(void* h, int i) {
  return static_cast<Bundle*>(h)->tensors[i].shape.data();
}

const void* epnn_bundle_data(void* h, int i) {
  return static_cast<Bundle*>(h)->tensors[i].data;
}

long long epnn_bundle_nbytes(void* h, int i) {
  return static_cast<long long>(static_cast<Bundle*>(h)->tensors[i].size);
}

void epnn_bundle_close(void* h) { delete static_cast<Bundle*>(h); }

const char* epnn_bundle_error() { return g_error.c_str(); }

}  // extern "C"
