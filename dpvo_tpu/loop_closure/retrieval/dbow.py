"""Binary bag-of-words place recognition.

Wraps the C++ library (cpp/retrieval.cpp — the DBoW2/DPRetrieval
equivalent: hierarchical binary k-medians vocabulary + inverted-index
database with L1 BoW scoring) through ctypes, with a pure-numpy fallback
implementing the same algorithm when the .so is not built.

Unlike the reference (which hard-requires a pretrained 44MB ORB
vocabulary download, ref retrieval_dbow.py:31-34), the vocabulary here is
trained online from the first frames of the session.
"""
from __future__ import annotations

import ctypes
import os
import os.path as osp

import numpy as np

_LIB_PATHS = [
    osp.join(osp.dirname(osp.abspath(__file__)), "..", "..", "..", "cpp",
             "libretrieval.so"),
    osp.join(osp.dirname(osp.abspath(__file__)), "libretrieval.so"),
]


def _load_lib():
    for p in _LIB_PATHS:
        p = osp.abspath(p)
        if osp.isfile(p):
            lib = ctypes.CDLL(p)
            lib.retrieval_create.restype = ctypes.c_void_p
            lib.retrieval_create.argtypes = [ctypes.c_int, ctypes.c_int]
            lib.retrieval_destroy.argtypes = [ctypes.c_void_p]
            lib.retrieval_train.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int]
            lib.retrieval_is_trained.argtypes = [ctypes.c_void_p]
            lib.retrieval_is_trained.restype = ctypes.c_int
            lib.retrieval_add.argtypes = [
                ctypes.c_void_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
            lib.retrieval_query.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_float)]
            lib.retrieval_num_images.argtypes = [ctypes.c_void_p]
            lib.retrieval_num_images.restype = ctypes.c_int
            lib.retrieval_load_vocab.argtypes = [ctypes.c_void_p,
                                                 ctypes.c_char_p]
            lib.retrieval_load_vocab.restype = ctypes.c_int
            lib.retrieval_save_vocab.argtypes = [ctypes.c_void_p,
                                                 ctypes.c_char_p]
            lib.retrieval_save_vocab.restype = ctypes.c_int
            lib.retrieval_num_words.argtypes = [ctypes.c_void_p]
            lib.retrieval_num_words.restype = ctypes.c_int
            return lib
    return None


def try_build_lib():
    """Compile cpp/retrieval.cpp if g++ is available (build system hook)."""
    src = osp.abspath(osp.join(osp.dirname(osp.abspath(__file__)),
                               "..", "..", "..", "cpp", "retrieval.cpp"))
    out = src.replace("retrieval.cpp", "libretrieval.so")
    if not osp.isfile(src):
        return False
    code = os.system(f"g++ -O3 -shared -fPIC {src} -o {out} 2>/dev/null")
    return code == 0


class BinaryBoW:
    """Vocabulary + database over 32-byte binary descriptors."""

    def __init__(self, branching=10, depth=4, train_after=50):
        self.train_after = train_after
        self._pending = []           # (id, descs) until vocab trained
        self._lib = _load_lib()
        if self._lib is None and try_build_lib():
            self._lib = _load_lib()
        if self._lib is not None:
            self._h = self._lib.retrieval_create(branching, depth)
            self._py = None
        else:
            self._h = None
            self._py = _PyBoW(branching, depth)

    @property
    def trained(self):
        if self._lib is not None:
            return bool(self._lib.retrieval_is_trained(self._h))
        return self._py.trained

    def _ptr(self, descs):
        descs = np.ascontiguousarray(descs, dtype=np.uint8)
        return descs, descs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))

    def add(self, image_id, descs):
        if descs is None or len(descs) == 0:
            descs = np.zeros((0, 32), np.uint8)
        if self._lib is not None:
            d, p = self._ptr(descs)
            self._lib.retrieval_add(self._h, int(image_id), p, len(d))
        else:
            self._py.add(image_id, descs)

        if not self.trained:
            self._pending.append(np.asarray(descs, np.uint8))
            if len(self._pending) >= self.train_after:
                self.train(np.concatenate(self._pending, axis=0))

    def train(self, descs):
        if len(descs) == 0:
            return
        if self._lib is not None:
            d, p = self._ptr(descs)
            self._lib.retrieval_train(self._h, p, len(d))
        else:
            self._py.train(descs)
        self._pending = []

    def load_vocab(self, path):
        """Load a DBoW2 text-format vocabulary (e.g. the reference's
        pretrained ORBvoc.txt, ref retrieval_dbow.py:31-34 /
        DPRetrieval main.cpp:49-63).  Returns the word count.  Frames
        already added are re-indexed with the loaded vocabulary."""
        if self._lib is not None:
            n = self._lib.retrieval_load_vocab(
                self._h, str(path).encode())
            if n < 0:
                raise IOError(f"failed to load DBoW2 vocabulary: {path}")
        else:
            n = self._py.load_vocab(path)
        self._pending = []
        return n

    def save_vocab(self, path):
        """Write the current vocabulary in DBoW2 text format."""
        if self._lib is not None:
            if self._lib.retrieval_save_vocab(self._h,
                                              str(path).encode()) != 0:
                raise IOError(f"failed to save vocabulary to {path}")
        else:
            self._py.save_vocab(path)

    def query(self, descs, qid, min_gap=20):
        """-> (best_image_id or -1, score)."""
        if not self.trained or descs is None or len(descs) == 0:
            return -1, 0.0
        if self._lib is not None:
            d, p = self._ptr(descs)
            out_id = ctypes.c_int(-1)
            out_score = ctypes.c_float(0.0)
            self._lib.retrieval_query(self._h, p, len(d), int(qid),
                                      int(min_gap),
                                      ctypes.byref(out_id),
                                      ctypes.byref(out_score))
            return out_id.value, out_score.value
        return self._py.query(descs, qid, min_gap)

    def __del__(self):
        if getattr(self, "_lib", None) is not None and self._h:
            self._lib.retrieval_destroy(self._h)
            self._h = None


class _PyBoW:
    """Numpy fallback: same hierarchical binary k-medians + L1 scoring."""

    def __init__(self, branching=10, depth=4):
        self.branching = branching
        self.depth = depth
        self.trained = False
        self.raw = {}
        self.bow = {}
        self.inverted = {}
        self.rng = np.random.default_rng(42)

    @staticmethod
    def _bits(descs):
        return np.unpackbits(descs, axis=1)        # (n, 256)

    def train(self, descs):
        bits = self._bits(np.asarray(descs, np.uint8))
        self.centroids = []   # list of (bits_array, children | word_id)
        self.tree = []

        def build(items, level):
            idx = len(self.tree)
            node = {"centroid": (items.mean(0) > 0.5).astype(np.uint8),
                    "children": [], "word": -1}
            self.tree.append(node)
            if level >= self.depth or len(items) <= self.branching:
                node["word"] = idx
                return idx
            k = min(self.branching, len(items))
            centers = items[self.rng.choice(len(items), k, replace=False)]
            for _ in range(8):
                dist = (items[:, None, :] != centers[None]).sum(-1)
                assign = dist.argmin(1)
                for c in range(k):
                    sel = items[assign == c]
                    if len(sel):
                        centers[c] = (sel.mean(0) > 0.5).astype(np.uint8)
            for c in range(k):
                sel = items[assign == c]
                if len(sel) == 0:
                    continue
                child = build(sel, level + 1)
                node["children"].append(child)
                self.tree[child]["parent"] = idx
            if not node["children"]:
                node["word"] = idx
            return idx

        build(bits, 0)
        self.trained = True
        for i, d in list(self.raw.items()):
            self._index(i, d)

    def load_vocab(self, path):
        """Parse a DBoW2 text-format vocabulary into the fallback tree
        (same format as cpp/retrieval.cpp load_vocab_text; fallback
        scores plain TF instead of TF-IDF)."""
        with open(path) as f:
            header = f.readline().split()
            k, L = int(header[0]), int(header[1])
            if not (0 <= k <= 20 and 1 <= L <= 10):
                raise IOError(f"not a DBoW2 text vocabulary: {path}")
            self.branching, self.depth = k, L
            self.tree = [{"centroid": np.zeros(256, np.uint8),
                          "children": [], "word": -1, "parent": -1}]
            n_words = 0
            for line in f:
                parts = line.split()
                if not parts:
                    continue
                pid, is_leaf = int(parts[0]), int(parts[1])
                byts = np.array([int(x) for x in parts[2:2 + 32]],
                                np.uint8)
                idx = len(self.tree)
                self.tree.append(
                    {"centroid": np.unpackbits(byts), "children": [],
                     "word": idx if is_leaf else -1, "parent": pid})
                self.tree[pid]["children"].append(idx)
                n_words += is_leaf
        self.trained = n_words > 0
        self.bow, self.inverted = {}, {}
        for i, d in list(self.raw.items()):
            if len(d):
                self._index(i, d)
        return n_words

    def save_vocab(self, path):
        with open(path, "w") as f:
            f.write(f"{self.branching} {self.depth} 0 0\n")
            for i in range(1, len(self.tree)):
                nd = self.tree[i]
                byts = np.packbits(nd["centroid"])
                f.write(f"{nd.get('parent', 0)} "
                        f"{1 if nd['word'] >= 0 else 0} "
                        + " ".join(str(int(b)) for b in byts) + " 1\n")

    def _word(self, bit):
        cur = 0
        while self.tree[cur]["word"] < 0:
            ch = self.tree[cur]["children"]
            dists = [(bit != self.tree[c]["centroid"]).sum() for c in ch]
            cur = ch[int(np.argmin(dists))]
        return self.tree[cur]["word"]

    def _transform(self, descs):
        bits = self._bits(np.asarray(descs, np.uint8))
        v = {}
        for b in bits:
            w = self._word(b)
            v[w] = v.get(w, 0.0) + 1.0
        s = sum(v.values())
        return {k: x / s for k, x in v.items()}

    def _index(self, image_id, descs):
        v = self._transform(descs)
        self.bow[image_id] = v
        for w in v:
            self.inverted.setdefault(w, []).append(image_id)

    def add(self, image_id, descs):
        self.raw[image_id] = np.asarray(descs, np.uint8)
        if self.trained and len(descs):
            self._index(image_id, descs)

    def query(self, descs, qid, min_gap=20):
        v = self._transform(descs)
        cands = set()
        for w in v:
            for i in self.inverted.get(w, []):
                if abs(i - qid) >= min_gap:
                    cands.add(i)
        best, best_s = -1, 0.0
        for i in cands:
            u = self.bow[i]
            s = 0.0
            for w, a in v.items():
                if w in u:
                    s += abs(a) + abs(u[w]) - abs(a - u[w])
            s /= 2
            if s > best_s:
                best, best_s = i, s
        return best, best_s
