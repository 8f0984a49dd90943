// Bag-of-binary-words place recognition (DBoW2-equivalent, C++).
//
// TPU-native rebuild of the reference's retrieval stack: DBoW2's
// hierarchical-kmeans vocabulary + inverted-index database
// (ref modules/DBoW2/include/DBoW2/TemplatedVocabulary.h,
// TemplatedDatabase.h) and the DPRetrieval pybind11 wrapper
// (ref modules/DPRetrieval/src/main.cpp).  Differences by design:
//  - vocabulary is trained ONLINE from the descriptors the session has
//    seen (binary k-medians tree), so no pretrained ORB vocab file is
//    required (the reference hard-fails without its 44MB download);
//    loading a DBoW2-format text vocabulary is also supported.
//  - bound with a plain C API for Python ctypes (no pybind11 in image).
//
// Descriptors are 32-byte (256-bit) binary strings (OpenCV ORB layout).
// Scoring: L1 on TF-IDF-weighted normalized BoW vectors, as DBoW2's
// default L1_NORM scoring.
//
// Build: g++ -O3 -march=native -shared -fPIC retrieval.cpp -o libretrieval.so

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cmath>
#include <vector>
#include <map>
#include <unordered_map>
#include <algorithm>
#include <random>
#include <fstream>
#include <sstream>
#include <string>

namespace {

constexpr int DESC_BYTES = 32;

struct Desc {
  uint8_t d[DESC_BYTES];
};

inline int hamming(const Desc& a, const Desc& b) {
  int dist = 0;
  const uint64_t* pa = reinterpret_cast<const uint64_t*>(a.d);
  const uint64_t* pb = reinterpret_cast<const uint64_t*>(b.d);
  for (int i = 0; i < DESC_BYTES / 8; i++)
    dist += __builtin_popcountll(pa[i] ^ pb[i]);
  return dist;
}

// bitwise median of a descriptor set
Desc bit_median(const std::vector<const Desc*>& ds) {
  Desc out;
  std::memset(out.d, 0, DESC_BYTES);
  if (ds.empty()) return out;
  int counts[DESC_BYTES * 8] = {0};
  for (const Desc* p : ds)
    for (int byte = 0; byte < DESC_BYTES; byte++)
      for (int bit = 0; bit < 8; bit++)
        if (p->d[byte] & (1u << bit)) counts[byte * 8 + bit]++;
  const int half = (int)ds.size() / 2;
  for (int byte = 0; byte < DESC_BYTES; byte++)
    for (int bit = 0; bit < 8; bit++)
      if (counts[byte * 8 + bit] > half) out.d[byte] |= (1u << bit);
  return out;
}

struct Node {
  Desc centroid;
  std::vector<int> children;  // DBoW2 text vocabs allow k up to 20
  int parent = -1;            // for text-format save
  int word_id = -1;           // leaf word index, -1 for internal
  float weight = 0.f;         // idf weight (leaves)
};

struct BowVector : std::map<int, float> {
  void add(int w, float v) { (*this)[w] += v; }
  void normalize_l1() {
    float s = 0.f;
    for (auto& kv : *this) s += std::fabs(kv.second);
    if (s > 0)
      for (auto& kv : *this) kv.second /= s;
  }
};

// L1 score as in DBoW2 (ScoringObject.cc L1Scoring): higher is better.
float l1_score(const BowVector& a, const BowVector& b) {
  float score = 0.f;
  auto ia = a.begin();
  auto ib = b.begin();
  while (ia != a.end() && ib != b.end()) {
    if (ia->first == ib->first) {
      score += std::fabs(ia->second) + std::fabs(ib->second)
             - std::fabs(ia->second - ib->second);
      ++ia; ++ib;
    } else if (ia->first < ib->first) ++ia;
    else ++ib;
  }
  return score / 2.0f;
}

struct Retrieval {
  int branching = 10;
  int depth = 4;
  std::vector<Node> nodes;
  int n_words = 0;
  bool trained = false;

  // database
  std::vector<BowVector> images;                 // per image id
  std::vector<std::vector<Desc>> raw;            // raw descriptors kept
  std::unordered_map<int, std::vector<int>> inverted;  // word -> image ids
  std::mt19937 rng{42};

  // --- vocabulary training (hierarchical binary k-medians) ---
  int build_level(std::vector<const Desc*>& items, int level) {
    int idx = (int)nodes.size();
    nodes.emplace_back();
    nodes[idx].centroid = bit_median(items);

    if (level >= depth || (int)items.size() <= branching) {
      nodes[idx].word_id = n_words++;
      return idx;
    }

    // k-medians with branching clusters
    int k = std::min<int>(branching, (int)items.size());
    std::vector<Desc> centers(k);
    std::uniform_int_distribution<size_t> pick(0, items.size() - 1);
    for (int c = 0; c < k; c++) centers[c] = *items[pick(rng)];

    std::vector<int> assign(items.size());
    for (int iter = 0; iter < 8; iter++) {
      for (size_t i = 0; i < items.size(); i++) {
        int best = 0, bd = 1 << 30;
        for (int c = 0; c < k; c++) {
          int d = hamming(*items[i], centers[c]);
          if (d < bd) { bd = d; best = c; }
        }
        assign[i] = best;
      }
      for (int c = 0; c < k; c++) {
        std::vector<const Desc*> sub;
        for (size_t i = 0; i < items.size(); i++)
          if (assign[i] == c) sub.push_back(items[i]);
        if (!sub.empty()) centers[c] = bit_median(sub);
      }
    }

    for (int c = 0; c < k; c++) {
      std::vector<const Desc*> sub;
      for (size_t i = 0; i < items.size(); i++)
        if (assign[i] == c) sub.push_back(items[i]);
      if (sub.empty()) continue;
      int child = build_level(sub, level + 1);
      // note: recursion may reallocate `nodes`; re-index via idx each time
      nodes[idx].children.push_back(child);
      nodes[child].parent = idx;
    }
    if (nodes[idx].children.empty()) nodes[idx].word_id = n_words++;
    return idx;
  }

  void train(const uint8_t* descs, int n) {
    nodes.clear();
    n_words = 0;
    const Desc* d = reinterpret_cast<const Desc*>(descs);
    std::vector<const Desc*> items(n);
    for (int i = 0; i < n; i++) items[i] = &d[i];
    build_level(items, 0);
    // uniform idf to start; updated as the database grows
    for (auto& nd : nodes)
      if (nd.word_id >= 0) nd.weight = 1.0f;
    trained = true;
  }

  // leaf NODE index for a descriptor (descend by hamming distance)
  int leaf_of(const Desc& d) const {
    int cur = 0;
    while (nodes[cur].word_id < 0) {
      int best = -1, bd = 1 << 30;
      for (int child : nodes[cur].children) {
        int dist = hamming(d, nodes[child].centroid);
        if (dist < bd) { bd = dist; best = child; }
      }
      if (best < 0) break;
      cur = best;
    }
    return cur;
  }

  int word_of(const Desc& d) const { return nodes[leaf_of(d)].word_id; }

  BowVector transform(const uint8_t* descs, int n) const {
    BowVector v;
    const Desc* d = reinterpret_cast<const Desc*>(descs);
    for (int i = 0; i < n; i++) {
      const Node& leaf = nodes[leaf_of(d[i])];
      // TF-IDF: term frequency x stored idf weight (DBoW2
      // TemplatedVocabulary::transform with WeightingType::TF_IDF);
      // online-trained vocabs use weight 1 (plain TF)
      if (leaf.word_id >= 0 && leaf.weight > 0.f)
        v.add(leaf.word_id, leaf.weight);
    }
    v.normalize_l1();
    return v;
  }

  void add(int image_id, const uint8_t* descs, int n) {
    if ((int)images.size() <= image_id) {
      images.resize(image_id + 1);
      raw.resize(image_id + 1);
    }
    raw[image_id].assign(reinterpret_cast<const Desc*>(descs),
                         reinterpret_cast<const Desc*>(descs) + n);
    if (!trained) return;  // will be (re)indexed after training
    BowVector v = transform(descs, n);
    images[image_id] = v;
    for (auto& kv : v) inverted[kv.first].push_back(image_id);
  }

  void reindex() {
    inverted.clear();
    for (size_t i = 0; i < raw.size(); i++) {
      if (raw[i].empty()) continue;
      BowVector v = transform(
          reinterpret_cast<const uint8_t*>(raw[i].data()),
          (int)raw[i].size());
      images[i] = v;
      for (auto& kv : v) inverted[kv.first].push_back((int)i);
    }
  }

  // --- DBoW2 text-format vocabulary IO ---
  // Format (ref modules/DBoW2/include/DBoW2/TemplatedVocabulary.h
  // loadFromTextFile/saveToTextFile): header "k L scoring weighting",
  // then one line per non-root node in id order:
  //   parent_id is_leaf b0 b1 ... b31 weight
  // Node ids are implicit (line order, root = 0); word ids are assigned
  // in leaf encounter order.  This is the format of the reference's
  // pretrained ORB vocabulary (ORBvoc.txt).
  bool load_vocab_text(const char* path) {
    std::ifstream f(path);
    if (!f.is_open()) return false;
    std::string line;
    if (!std::getline(f, line)) return false;
    {
      std::istringstream ss(line);
      int k = -1, L = -1, n1 = -1, n2 = -1;
      ss >> k >> L >> n1 >> n2;
      if (k < 0 || k > 20 || L < 1 || L > 10 || n1 < 0 || n1 > 5 ||
          n2 < 0 || n2 > 3)
        return false;  // not a DBoW2 text vocabulary
      branching = k;
      depth = L;
    }
    nodes.clear();
    n_words = 0;
    nodes.emplace_back();  // root
    while (std::getline(f, line)) {
      if (line.empty()) continue;
      std::istringstream ss(line);
      int pid = -1, is_leaf = 0;
      ss >> pid >> is_leaf;
      if (pid < 0 || pid >= (int)nodes.size()) return false;
      int nid = (int)nodes.size();
      nodes.emplace_back();
      Node& nd = nodes.back();
      nd.parent = pid;
      for (int b = 0; b < DESC_BYTES; b++) {
        int v = 0;
        if (!(ss >> v)) return false;
        nd.centroid.d[b] = (uint8_t)v;
      }
      double w = 0.0;
      ss >> w;
      nd.weight = (float)w;
      nodes[pid].children.push_back(nid);
      if (is_leaf > 0) nd.word_id = n_words++;
    }
    trained = n_words > 0;
    return trained;
  }

  bool save_vocab_text(const char* path) const {
    std::ofstream f(path);
    if (!f.is_open()) return false;
    // scoring=0 (L1_NORM), weighting=0 (TF_IDF) — DBoW2's defaults and
    // what this module implements
    f << branching << " " << depth << " " << 0 << " " << 0 << "\n";
    // nodes must be written in id order with parent ids smaller than
    // child ids; build_level emits exactly that order (parent created
    // before its children), so node index order works for both
    // trained and loaded vocabularies
    for (size_t i = 1; i < nodes.size(); i++) {
      const Node& nd = nodes[i];
      f << nd.parent << " " << (nd.word_id >= 0 ? 1 : 0);
      for (int b = 0; b < DESC_BYTES; b++)
        f << " " << (int)nd.centroid.d[b];
      f << " " << nd.weight << "\n";
    }
    return true;
  }

  // best match at least `min_gap` ids away (ref DPRetrieval `rad`)
  void query(const uint8_t* descs, int n, int qid, int min_gap,
             int* out_id, float* out_score) const {
    *out_id = -1;
    *out_score = 0.f;
    if (!trained) return;
    BowVector v = transform(descs, n);

    std::unordered_map<int, char> cand;
    for (auto& kv : v) {
      auto it = inverted.find(kv.first);
      if (it == inverted.end()) continue;
      for (int id : it->second)
        if (std::abs(id - qid) >= min_gap) cand[id] = 1;
    }
    for (auto& kv : cand) {
      float s = l1_score(v, images[kv.first]);
      if (s > *out_score) { *out_score = s; *out_id = kv.first; }
    }
  }
};

}  // namespace

extern "C" {

void* retrieval_create(int branching, int depth) {
  auto* r = new Retrieval();
  r->branching = branching;
  r->depth = depth;
  return r;
}

void retrieval_destroy(void* h) { delete static_cast<Retrieval*>(h); }

void retrieval_train(void* h, const uint8_t* descs, int n) {
  auto* r = static_cast<Retrieval*>(h);
  r->train(descs, n);
  r->reindex();
}

int retrieval_is_trained(void* h) {
  return static_cast<Retrieval*>(h)->trained ? 1 : 0;
}

void retrieval_add(void* h, int image_id, const uint8_t* descs, int n) {
  static_cast<Retrieval*>(h)->add(image_id, descs, n);
}

void retrieval_query(void* h, const uint8_t* descs, int n, int qid,
                     int min_gap, int* out_id, float* out_score) {
  static_cast<Retrieval*>(h)->query(descs, n, qid, min_gap, out_id,
                                    out_score);
}

int retrieval_num_images(void* h) {
  return (int)static_cast<Retrieval*>(h)->raw.size();
}

// Load a DBoW2 text-format vocabulary (e.g. the reference's pretrained
// ORBvoc.txt).  Returns the word count, or -1 on parse/open failure.
// Re-indexes any images already added with the new vocabulary.
int retrieval_load_vocab(void* h, const char* path) {
  auto* r = static_cast<Retrieval*>(h);
  if (!r->load_vocab_text(path)) return -1;
  r->reindex();
  return r->n_words;
}

// Save the current vocabulary in DBoW2 text format.  Returns 0 on
// success, -1 on failure (untrained or unwritable path).
int retrieval_save_vocab(void* h, const char* path) {
  auto* r = static_cast<Retrieval*>(h);
  if (!r->trained) return -1;
  return r->save_vocab_text(path) ? 0 : -1;
}

int retrieval_num_words(void* h) {
  return static_cast<Retrieval*>(h)->n_words;
}

}  // extern "C"
