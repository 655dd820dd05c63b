// BSP hull collision for the game host.
//
// The quakespasm server clips all entity movement against the world's
// clipnode hulls and other entities' box hulls (SURVEY.md §2.5 "entity
// simulation, physics"; the renderer-side contract consumes the
// resulting entity origins via quake_node.cpp's extraction). This is a
// clean-room implementation of that collision model: hulls are fed in
// as flat arrays (parsed Python-side by models/bsp.py, or constructed
// programmatically in tests) — planes, clipnodes and per-model head
// nodes — and traces run the classic recursive hull check.
#pragma once

#include <cstdint>
#include <vector>

namespace mqgame {

// Point contents values (BSP leaf contents).
enum {
  CONTENTS_EMPTY = -1,
  CONTENTS_SOLID = -2,
  CONTENTS_WATER = -3,
  CONTENTS_SLIME = -4,
  CONTENTS_LAVA = -5,
  CONTENTS_SKY = -6,
};

struct ClipNode {
  int32_t planenum;
  int32_t children[2];  // >= 0: clipnode index; < 0: contents
};

struct Plane {
  float normal[3];
  float dist;
};

struct Hull {
  const ClipNode* clipnodes = nullptr;
  const Plane* planes = nullptr;
  int firstclipnode = 0;
  int lastclipnode = 0;
  float clip_mins[3] = {0, 0, 0};
  float clip_maxs[3] = {0, 0, 0};
};

struct Trace {
  bool allsolid = true;    // never left solid
  bool startsolid = false; // started inside solid
  bool inopen = false, inwater = false;
  float fraction = 1.0f;   // 1.0 = reached end
  float endpos[3] = {0, 0, 0};
  Plane plane = {{0, 0, 1}, 0};  // surface hit
  int ent = -1;                  // edict index hit (host fills in)
};

// One collision model (the world or an inline brush model "*N"):
// three hulls (point, player, big) over shared plane/clipnode tables.
struct CModel {
  Hull hulls[3];
  float mins[3], maxs[3];
};

class CollisionWorld {
 public:
  // Takes ownership of copies of the tables. headnodes is [nmodels][3].
  void Load(const float* planes, int nplanes, const int32_t* clipnodes,
            int nclipnodes, const int32_t* headnodes, const float* bounds,
            int nmodels);

  int NumModels() const { return (int)models_.size(); }
  const CModel& Model(int i) const { return models_[i]; }

  // Hull selection for an entity bbox (SV_HullForEntity): the hull
  // whose clip size best matches (maxs - mins), offset returned so the
  // trace runs in hull space.
  const Hull& HullForBox(const CModel& m, const float* mins,
                         const float* maxs, float* offset) const;

  static int HullPointContents(const Hull& h, int num, const float* p);
  // The classic recursive hull check; returns false if start is solid
  // all the way. Appends result into `trace`.
  static bool RecursiveHullCheck(const Hull& h, int num, float p1f, float p2f,
                                 const float* p1, const float* p2,
                                 Trace* trace);

  // Build a temporary box hull (SOLID_BBOX entities).
  struct BoxHull {
    ClipNode nodes[6];
    Plane planes[6];
    Hull hull;
  };
  static void MakeBoxHull(const float* mins, const float* maxs, BoxHull* out);

 private:
  std::vector<Plane> planes_;
  std::vector<ClipNode> clipnodes_;
  std::vector<CModel> models_;
};

}  // namespace mqgame
