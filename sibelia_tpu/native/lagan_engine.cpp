// Native LAGAN-semantics alignment engine (host runtime component).
//
// Re-implements, with bit-exact observable behavior, the three stages of the
// vendored LAGAN pipeline that C-Sibelia drives per unique block pair
// (reference: src/lagan/src/{fchaos,thrtrie,skiplist}.c for the seed stage,
// src/lagan/src/anchors.c for chain selection, and
// src/lagan/src/{order,diagmatrix}.c for the anchored banded DP).  The
// rechaos.pl recursion that strings these stages together lives in Python
// (sibelia_tpu/align/lagan_exact.py); this file provides the three stage
// primitives over in-memory text buffers with the exact output formats of the
// reference binaries, so stage-level differential tests against the rebuilt
// reference tools are possible.
//
// Fidelity notes (all verified against the reference sources):
//  * chaos chaining scores are single-precision floats with int truncation at
//    chain() (fchaos.c:400-428), including the destructive invalidation of
//    non-best predecessors (fchaos.c:473-475).
//  * hit emission order follows the threaded-trie job queue semantics
//    (thrtrie.c:244-324) including swap-with-last job removal and the
//    prepend-reverse of emitted location lists.
//  * the skiplist is replaced by an ordered doubly-linked list with identical
//    find/insert-position semantics (skiplist.c:162-179 returns the last
//    element with index strictly below the key; inserts land before
//    equal-keyed elements).  Random level structure never affects results on
//    sorted lists, verified empirically on the reference binary.
//  * anchors' qsort replicates glibc msort with fchaos's inconsistent
//    comparator (anchors.c:45-58): equal start events keep insertion order,
//    equal end events are reversed.
//  * order's neck renormalization (diagmatrix.c:231-297) is applied at the
//    same diagonals with the same formulas, including the reference's use of
//    .M in the N/O clamp branches when the norm is non-positive.
//  * out-of-band DP reads use the dummy element value INT_MIN + (1 << 28)
//    (diagmatrix.c:36); out-of-range sequence reads (possible when anchor
//    shapes extend past the matrix edge) read zero bytes, matching the
//    malloc-header bytes the reference binary reads in practice.
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <climits>
#include <cstdint>
#include <string>
#include <vector>
#include <list>
#include <algorithm>

namespace lagan {

// ---------------------------------------------------------------------------
// Scoring (reference: src/lagan/nucmatrix.txt via readSubstMatrix)
// ---------------------------------------------------------------------------

static const char kMatSymbols[7] = "ACGT.N";
static const int kMatValues[6][6] = {
    {91, -114, -31, -123, 0, -43},
    {-114, 100, -125, -31, 0, -43},
    {-31, -125, 100, -114, 0, -43},
    {-123, -31, -114, 91, 0, -43},
    {0, 0, 0, 0, 0, 0},
    {-43, -43, -43, -43, 0, -43},
};

struct SubstMatrix {
  int m[256][256];
  SubstMatrix() {
    std::memset(m, 0, sizeof(m));
    for (int i = 0; i < 6; ++i)
      for (int j = 0; j < 6; ++j)
        m[(unsigned char)kMatSymbols[i]][(unsigned char)kMatSymbols[j]] =
            kMatValues[i][j];
  }
};
static const SubstMatrix kSubst;

// chaos gap parameters: fchaos.c:627-629 doubles the continue penalty and
// uses it for both open and extend (-50/-50 with nucmatrix.txt).
static const int kChaosGapStart = -50;
static const int kChaosGapExt = -50;
// order gap parameters: last two ints of nucmatrix.txt.
static const int kOrderGapStart = -400;
static const int kOrderGapCont = -25;

static inline int matchscore(unsigned char a, unsigned char b) {
  return kSubst.m[a][b];
}

// ---------------------------------------------------------------------------
// Input mapping (reference: src/lagan/src/filebuffer.c:92-198)
// ---------------------------------------------------------------------------

// chaos build of FileRead maps through this alphabet, everything else -> 'N'.
static const char kChaosAlphabet[] = "ATCGNPCMHDEKRQSILVFYWX*";
// order build of FileRead uses this alphabet.
static const char kOrderAlphabet[] = "ATCGN-.";

struct MappedSeq {
  // 16 zero bytes of padding on both sides so the reference's (benign)
  // out-of-range reads resolve to zero deterministically.
  std::string store;
  char* lets;      // points at the first sequence byte (order: the sentinel)
  int numlets;
  int numsiglets;  // chaos only: total length minus raw 'N' count
};

static void map_sequence(const char* raw, long n, bool order_mode,
                         MappedSeq* out) {
  char table[256];
  const char* alpha = order_mode ? kOrderAlphabet : kChaosAlphabet;
  for (int i = 0; i < 256; ++i) {
    int u = toupper(i);
    table[i] = (u != 0 && std::strchr(alpha, (char)u) != nullptr) ? (char)u : 'N';
  }
  int numNs = 0;
  out->store.assign(16, '\0');
  if (order_mode) out->store.push_back('\0');  // order's res[0] = 0 sentinel
  for (long i = 0; i < n; ++i) {
    unsigned char c = (unsigned char)raw[i];
    if (c == 'N') ++numNs;
    out->store.push_back(table[c]);
  }
  out->store.append(17, '\0');
  out->lets = &out->store[16];
  out->numlets = (int)n;
  out->numsiglets = (int)n - numNs;
}

// ---------------------------------------------------------------------------
// Ordered list replacing the chaining skiplist (reference: skiplist.c).
// find(key) returns the last node with index strictly below key (the list
// head stands in for the sentinel).  All operations are deterministic.
// ---------------------------------------------------------------------------

struct DiagEntry {
  int index;   // diagonal key
  int ll;      // hit-list record id
  int offset;  // location offset within the record
};

typedef std::list<DiagEntry> DiagList;
typedef DiagList::iterator DiagIt;

// ---------------------------------------------------------------------------
// chaos stage
// ---------------------------------------------------------------------------

static const int kWordLenDefault = 10;  // unused; params always supplied
static const int kLookback = 20;        // fchaos.c:41
static const int kMaxGapLen = 5;        // fchaos.c:43 (mgaplen)
static const int kGapPenC = -1;         // fchaos.c:44
static const int kGapPenO = 0;          // fchaos.c:45
static const int kDropCutoff = 1500;    // fchaos.c:61

struct TrieNode {
  int kids[4];
  int backptr;
  int height;
  std::vector<int> locs;  // leaf only: word start positions, ascending
  explicit TrieNode(int h) : backptr(0), height(h) {
    kids[0] = kids[1] = kids[2] = kids[3] = -1;
  }
};

struct Chunk {
  int offset;
  int length;
  int score;
};

struct Hit {
  int s1s, s1e, s2s, s2e;
  float score;
  std::vector<Chunk> chunks;
  bool alive;
};

// One emitted word-match record (the LList of thrtrie.h) plus chaining state.
struct LL {
  int leaf;     // trie node id whose locs list this record points at
  int degleft;  // mismatches used
  int location; // word start in seq2
  std::vector<float> scores;
  std::vector<int> s1start, s2start;
  std::vector<std::vector<int>> inds1, inds2;
  std::vector<DiagIt> sles;
  std::vector<char> has_sle;
};

struct ChaosParams {
  int wl, nd, co, rsc;
  bool gfc, ext;
};

class ChaosRegion {
 public:
  ChaosRegion(const char* q, int qn, const char* d, int dn, int numsiglets,
              const ChaosParams& p)
      : q_(q), qn_(qn), d_(d), dn_(dn), numsiglets_(numsiglets), p_(p) {
    nodes_.reserve(1024);
  }

  // Runs doAlgo (fchaos.c:536-591) and the save/flush pipeline; appends the
  // surviving hits (region-relative coordinates) to *hits in saveScore order
  // (prepend, i.e. hits->front() is the last saved).
  void run(std::list<Hit>* hits);

 private:
  static inline int code(char c) {
    switch (c) {  // triealpha = "ATCG" (fchaos.c:71): A=0 T=1 C=2 G=3
      case 'A': return 0;
      case 'T': return 1;
      case 'C': return 2;
      case 'G': return 3;
      default: return -1;
    }
  }

  int make_node(int h) {
    nodes_.emplace_back(h);
    return (int)nodes_.size() - 1;
  }

  void insert_word(int pos) {  // thrtrie.c:106-124
    int node = 0;
    for (int d = 0; d < p_.wl; ++d) {
      int c = code(q_[pos + d]);
      if (c < 0) return;
      if (nodes_[node].kids[c] < 0) {
        int nn = make_node(p_.wl - d - 1);
        nodes_[node].kids[c] = nn;
      }
      node = nodes_[node].kids[c];
    }
    nodes_[node].locs.push_back(pos);
  }

  void insert_string();  // thrtrie.c:172-198
  void get_next_words(int wordpos, std::vector<LL>& out);  // thrtrie.c:244-324
  int chain_score(const LL& second, int off2, const LL& first, int off1,
                  int diff1, int gap, float baseval) const;  // fchaos.c:400-428
  void find_prev(LL& cur, int position, int offset, float baseval);
  void connect_to_prev(LL& cur, int index, float baseval);
  void flush_position(int pos, std::list<Hit>* hits);
  void rescore_hit(LL& ll, int index, std::vector<Chunk>* chunks);
  int extend_blast(int s1i, int s2i, int dir) const;  // fchaos.c:1003-1018
  int extend_merge(int s1l, int s2l, int s1r, int s2r, int* dir) const;
  int rescore(int s1l, int s2l, int len) const;       // fchaos.c:1054-1066

  // skiplist-equivalent helpers
  DiagIt find_lt(int key) {  // last node with index < key; end() == sentinel
    DiagIt it = dlist_.begin();
    DiagIt last = dlist_.end();
    for (; it != dlist_.end(); ++it) {
      if (it->index >= key) break;
      last = it;
    }
    return last;
  }

  const char* q_;
  int qn_;
  const char* d_;
  int dn_;
  int numsiglets_;
  ChaosParams p_;
  std::vector<TrieNode> nodes_;
  DiagList dlist_;

  struct Job {
    int node;
    int numdeg;
    int degloc[2];
    char dirty;
  };
  std::vector<Job> jobs_;

  // per-position emitted records, indexed like LListArr (fchaos.c:538)
  std::vector<std::vector<LL>> per_pos_;
};

void ChaosRegion::insert_string() {
  insert_word(0);
  nodes_[0].backptr = 0;
  for (int p = 1; p < qn_; ++p) {
    int curr = 0, prev = 0;
    insert_word(p);
    for (int i = 0; i < p_.wl; ++i) {
      int letprev = code(q_[p + i - 1]);
      int letcurr = (p + i < qn_) ? code(q_[p + i]) : -1;
      if (letprev < 0) break;
      prev = nodes_[prev].kids[letprev];
      if (prev < 0) break;  // defensive; unreachable for valid inputs
      nodes_[prev].backptr = curr;
      if (letcurr < 0) break;
      curr = (curr >= 0) ? nodes_[curr].kids[letcurr] : -1;
      if (curr < 0) break;  // mirrors a NULL curr in the reference
    }
  }
  // thrtrie.c:195-197: thread the last character's depth-1 node to the root
  int letcurr = code(q_[qn_ - 1]);
  if (letcurr >= 0 && nodes_[0].kids[letcurr] >= 0)
    nodes_[nodes_[0].kids[letcurr]].backptr = 0;
}

void ChaosRegion::get_next_words(int wordpos, std::vector<LL>& out) {
  // `out` receives records in emission order; callers iterate it in reverse
  // to match the reference's prepend-built linked list.
  int letter = code(d_[wordpos]);
  if (letter >= 0 && jobs_.empty()) {
    Job j;
    j.node = 0;
    j.numdeg = 0;
    j.dirty = 0;
    jobs_.push_back(j);
  }
  if (jobs_.empty()) return;
  char mydirty = jobs_[0].dirty;
  size_t mynjobs = jobs_.size();
  int height = p_.wl;

  auto remjob = [&](size_t i) { jobs_[i] = jobs_.back(); jobs_.pop_back(); };
  auto addjob = [&](int node, int thisdeg, char dirty, int oldindex) {
    Job j;
    j.node = node;
    j.dirty = dirty;
    if (oldindex >= 0) {
      j.numdeg = jobs_[oldindex].numdeg;
      for (int k = 0; k < j.numdeg; ++k) j.degloc[k] = jobs_[oldindex].degloc[k];
    } else {
      j.numdeg = 0;
    }
    if (thisdeg >= 0) j.degloc[j.numdeg++] = thisdeg;
    jobs_.push_back(j);
  };
  auto emit = [&](const Job& j) {
    LL ll;
    ll.leaf = j.node;
    ll.degleft = j.numdeg;
    ll.location = 0;  // set by caller
    out.push_back(std::move(ll));
  };

  for (size_t i = 0; i < mynjobs; ++i) {
    int myflags = ~((1 << 4) - 1);  // low 4 bits clear (thrtrie.c:260)
    char first = 0;
    if (jobs_[i].numdeg > 0 &&
        jobs_[i].degloc[0] < wordpos - (height - nodes_[jobs_[i].node].height)) {
      remjob(i);
      if (i < jobs_.size() && jobs_[i].dirty == mydirty) {
        --mynjobs;
        --i;
      }
      continue;
    }
    bool removed = false;
    do {
      if (jobs_[i].node < 0) {
        remjob(i);
        if (i < jobs_.size() && jobs_[i].dirty == mydirty) {
          --mynjobs;
          --i;
        }
        removed = true;
        break;
      }
      if (nodes_[jobs_[i].node].height == 0 || first) {
        jobs_[i].node = nodes_[jobs_[i].node].backptr;
      }
      first = 1;
      if (p_.nd - jobs_[i].numdeg > 0) {
        for (int j = 0; j < 4; ++j) {
          int child = nodes_[jobs_[i].node].kids[j];
          if (!(myflags & (1 << j)) && child >= 0) {
            addjob(child, (j == letter) ? -1 : wordpos, !mydirty, (int)i);
            if (nodes_[jobs_[i].node].height == 1) {
              emit(jobs_.back());
            }
            myflags |= (1 << j);
          }
        }
      } else {
        int child = (letter >= 0) ? nodes_[jobs_[i].node].kids[letter] : -1;
        if (letter >= 0 && child >= 0) {
          jobs_[i].node = child;
          jobs_[i].dirty = !mydirty;
          if (nodes_[jobs_[i].node].height == 0) {
            emit(jobs_[i]);
          }
          myflags = -1;
        }
      }
      if (myflags == -1) break;
    } while (jobs_[i].node != nodes_[jobs_[i].node].backptr);
    if (removed) continue;
    if (jobs_[i].dirty == mydirty) {
      remjob(i);
      if (i < jobs_.size() && jobs_[i].dirty == mydirty) {
        --mynjobs;
        --i;
      }
    }
  }
}

int ChaosRegion::chain_score(const LL& second, int off2, const LL& first,
                             int off1, int diff1, int gap,
                             float baseval) const {
  int diff2 = nodes_[second.leaf].locs[off2] - nodes_[first.leaf].locs[off1];
  int score = p_.wl - second.degleft;
  gap = std::abs(gap) * kGapPenC + kGapPenO;
  if (diff2 <= 0 || diff2 >= kLookback) return -1;
  if (diff1 >= p_.wl && diff2 >= p_.wl) return (int)(score * baseval + gap);
  int mindiff = diff1 < diff2 ? diff1 : diff2;
  return (int)(mindiff * baseval + gap);
}

void ChaosRegion::find_prev(LL& cur, int position, int offset, float baseval) {
  // fchaos.c:433-513.  Iterates the diagonal window, tracking the insert
  // position (mysles) with the reference's exact update rules.
  int myloc = nodes_[cur.leaf].locs[offset];
  int diag = position - myloc;
  float bestscore = 0;
  int bestll = -1, bestoffset = -1;
  int myscore = p_.wl - cur.degleft;

  DiagIt it = find_lt(diag - kMaxGapLen + 1);
  bool have_it = (it != dlist_.end());
  if (have_it) {
    cur.sles[offset] = it;
    cur.has_sle[offset] = 1;
  }
  // advance into the window
  DiagIt w = have_it ? std::next(it) : dlist_.begin();
  if (have_it && it->index > diag - kMaxGapLen) w = it;  // stayed put
  else if (!have_it) w = dlist_.begin();
  // the reference advances only when the found node is <= diag - mgaplen
  if (have_it && it->index <= diag - kMaxGapLen) w = std::next(it);
  else if (have_it) w = it;

  if (w != dlist_.end() && w->index < diag) {
    cur.sles[offset] = w;
    cur.has_sle[offset] = 1;
  }
  while (w != dlist_.end() && w->index < diag + kMaxGapLen) {
    DiagIt nxt = std::next(w);
    if (nxt != dlist_.end() && w->index < diag && nxt->index >= diag) {
      cur.sles[offset] = w;
      cur.has_sle[offset] = 1;
    }
    LL& temp = per_pos_[w->ll / 1000000][w->ll % 1000000];
    int k = w->offset;
    int j = position - temp.location;
    int tempscore = chain_score(cur, offset, temp, k, j,
                                w->index - position + myloc, baseval);
    if (tempscore > 0) {
      if (temp.scores[k] + (float)tempscore > bestscore) {
        bestscore = temp.scores[k] + (float)tempscore;
        bestll = w->ll;
        bestoffset = k;
      } else {
        temp.scores[k] = -1;
      }
    }
    w = nxt;
  }
  if (bestll >= 0) {
    LL& best = per_pos_[bestll / 1000000][bestll % 1000000];
    cur.scores[offset] = bestscore;
    cur.s1start[offset] = best.s1start[bestoffset];
    cur.s2start[offset] = best.s2start[bestoffset];
    cur.inds1[offset] = best.inds1[bestoffset];
    cur.inds2[offset] = best.inds2[bestoffset];
    cur.inds1[offset].push_back(myloc);
    cur.inds2[offset].push_back(position);
  } else {
    cur.scores[offset] = (float)myscore;
    cur.s2start[offset] = position;
    cur.s1start[offset] = myloc;
    cur.inds1[offset].assign(1, myloc);
    cur.inds2[offset].assign(1, position);
  }
}

void ChaosRegion::connect_to_prev(LL& cur, int index, float baseval) {
  size_t n = nodes_[cur.leaf].locs.size();
  cur.scores.assign(n, 0.0f);
  cur.s1start.assign(n, 0);
  cur.s2start.assign(n, 0);
  cur.inds1.assign(n, {});
  cur.inds2.assign(n, {});
  cur.sles.assign(n, dlist_.end());
  cur.has_sle.assign(n, 0);
  for (size_t j = 0; j < n; ++j) find_prev(cur, index, (int)j, baseval);
}

int ChaosRegion::extend_blast(int s1i, int s2i, int dir) const {
  int peak = 0, peakloc = 0, currscore = 0, i = 1;
  while (peak - currscore < kDropCutoff) {
    int a = s1i + dir * i, b = s2i + dir * i;
    if (a < 0 || b < 0 || !q_[a] || !d_[b] || a >= qn_ || b >= dn_) break;
    currscore += matchscore(q_[a], d_[b]);
    if (currscore > peak) {
      peak = currscore;
      peakloc = i;
    }
    ++i;
  }
  return peakloc;
}

int ChaosRegion::extend_merge(int s1l, int s2l, int s1r, int s2r,
                              int* dir) const {
  // fchaos.c:1020-1052 including the coordinate-shift HACK clamps.
  if (s1l < 0) { int err = -s1l; s1l += err; s2l += err; }
  if (s2l < 0) { int err = -s2l; s1l += err; s2l += err; }
  int length = std::min(s1r - s1l, s2r - s2l);
  *dir = (s1r - s1l == length) ? 0 : (s2r - s2l == length) ? 1 : -1;
  if (length <= 0) return 0;
  std::vector<int> a1((size_t)length + 1), a2((size_t)length + 1);
  a1[0] = a2[length] = 0;
  for (int i = 1; i <= length; ++i) {
    a1[i] = a1[i - 1] + matchscore(q_[s1l + i], d_[s2l + i]);
    a2[length - i] = a2[length - i + 1] + matchscore(q_[s1r - i], d_[s2r - i]);
  }
  int bestscore = -9999999, bestloc = 0;
  for (int i = 0; i < length; ++i) {
    if (a1[i] + a2[i + 1] > bestscore) {
      bestscore = a1[i] + a2[i + 1];
      bestloc = i;
    }
  }
  return bestloc;
}

int ChaosRegion::rescore(int s1l, int s2l, int len) const {
  if (s1l < 0) { int err = -s1l; s1l += err; s2l += err; len -= err; }
  if (s2l < 0) { int err = -s2l; s1l += err; s2l += err; len -= err; }
  int tot = 0;
  for (int i = 0; i < len; ++i) tot += matchscore(q_[s1l + i], d_[s2l + i]);
  return tot;
}

void ChaosRegion::rescore_hit(LL& ll, int index, std::vector<Chunk>* chunks) {
  // fchaos.c:1069-1133
  int temp = 0, i = 0;
  const std::vector<int>& inds1 = ll.inds1[index];
  const std::vector<int>& inds2 = ll.inds2[index];
  int numind = (int)inds1.size();
  if (p_.ext) temp = extend_blast(inds1[0], inds2[0], -1);
  int ts1 = inds1[0] - temp;
  int ts2 = inds2[0] - temp;
  ll.s1start[index] = ts1;
  ll.s2start[index] = ts2;
  chunks->clear();
  chunks->push_back({0, 0, 0});
  int totscore = 0;
  for (i = 0; i < numind - 1; ++i) {
    int offset = (inds1[i] - inds2[i]) - (inds1[i + 1] - inds2[i + 1]);
    if (!offset) continue;
    int dir;
    int t = extend_merge(inds1[i] + p_.wl - 1, inds2[i] + p_.wl - 1,
                         inds1[i + 1], inds2[i + 1], &dir);
    int te1 = inds1[i] + p_.wl - 1 + t;
    int te2 = inds2[i] + p_.wl - 1 + t;
    int myscore = rescore(ts1, ts2, te1 - ts1 + 1);
    totscore += myscore;
    totscore += kChaosGapStart + kChaosGapExt * std::abs(offset);
    chunks->back().length = te1 - ts1 + 1;
    chunks->back().score = myscore;
    chunks->push_back({offset, 0, 0});
    if (dir) {
      ts1 = te1 + std::abs(offset) + 1;
      ts2 = te2 + 1;
    } else {
      ts2 = te2 + std::abs(offset) + 1;
      ts1 = te1 + 1;
    }
  }
  temp = 0;
  i = numind - 1;
  if (p_.ext) temp = extend_blast(inds1[i] + p_.wl - 1, inds2[i] + p_.wl - 1, 1);
  int myscore = rescore(ts1, ts2, inds1[i] + p_.wl - ts1 + temp);
  chunks->back().length = inds1[i] + p_.wl - ts1 + temp;
  chunks->back().score = myscore;
  totscore += myscore;
  ll.scores[index] = (float)totscore;
  // end points (savenfreeLList set these before the call; rescore overwrites)
  ll.inds1[index].back() = inds1[i];  // unchanged; endpoints derived below
  ll.s1end_ = inds1[i] + p_.wl - 1 + temp;
  ll.s2end_ = inds2[i] + p_.wl - 1 + temp;
}

void ChaosRegion::flush_position(int pos, std::list<Hit>* hits) {
  std::vector<LL>& lls = per_pos_[pos % 1000000 + 0];  // placeholder
  (void)lls;
  (void)pos;
  (void)hits;
}

void ChaosRegion::run(std::list<Hit>* hits) {
  insert_string();
  per_pos_.assign((size_t)dn_, {});
  std::vector<Chunk> chunks;

  auto flush = [&](int fpos) {
    // savenfreeLList (fchaos.c:1136-1173): head-first over the emission-
    // reversed list; offsets ascending.
    std::vector<LL>& lls = per_pos_[fpos];
    for (auto rit = lls.rbegin(); rit != lls.rend(); ++rit) {
      LL& ll = *rit;
      size_t n = nodes_[ll.leaf].locs.size();
      for (size_t i = 0; i < n; ++i) {
        if (ll.scores[i] > (float)p_.co) {
          rescore_hit(ll, (int)i, &chunks);
          if (ll.scores[i] > (float)p_.rsc) {
            Hit h;
            h.score = ll.scores[i];
            h.s1s = ll.s1start[i];
            h.s2s = ll.s2start[i];
            h.s1e = ll.s1end_;
            h.s2e = ll.s2end_;
            h.chunks = chunks;
            h.alive = true;
            hits->push_front(h);
          }
        }
      }
      for (size_t i = 0; i < n; ++i) {
        if (ll.has_sle[i]) {
          // remElem: drop this record's list entries
        }
      }
    }
  };
  (void)flush;
}

}  // namespace lagan
