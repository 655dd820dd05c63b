// BSP hull collision — see world.h.
#include "world.h"

#include <cmath>
#include <cstring>

namespace mqgame {

namespace {
constexpr float DIST_EPSILON = 0.03125f;  // 1/32, the classic epsilon
}

void CollisionWorld::Load(const float* planes, int nplanes,
                          const int32_t* clipnodes, int nclipnodes,
                          const int32_t* headnodes, const float* bounds,
                          int nmodels) {
  planes_.resize(nplanes);
  for (int i = 0; i < nplanes; i++) {
    std::memcpy(planes_[i].normal, planes + i * 4, 3 * sizeof(float));
    planes_[i].dist = planes[i * 4 + 3];
  }
  clipnodes_.resize(nclipnodes);
  for (int i = 0; i < nclipnodes; i++) {
    clipnodes_[i].planenum = clipnodes[i * 3];
    clipnodes_[i].children[0] = clipnodes[i * 3 + 1];
    clipnodes_[i].children[1] = clipnodes[i * 3 + 2];
  }
  // standard hull dimensions (fixed by the game ABI: player and
  // shambler-class hulls)
  static const float kMins[3][3] = {
      {0, 0, 0}, {-16, -16, -24}, {-32, -32, -24}};
  static const float kMaxs[3][3] = {{0, 0, 0}, {16, 16, 32}, {32, 32, 64}};
  models_.resize(nmodels);
  for (int m = 0; m < nmodels; m++) {
    for (int h = 0; h < 3; h++) {
      Hull& hull = models_[m].hulls[h];
      hull.clipnodes = clipnodes_.data();
      hull.planes = planes_.data();
      hull.firstclipnode = headnodes[m * 3 + h];
      hull.lastclipnode = nclipnodes - 1;
      std::memcpy(hull.clip_mins, kMins[h], sizeof(kMins[h]));
      std::memcpy(hull.clip_maxs, kMaxs[h], sizeof(kMaxs[h]));
    }
    std::memcpy(models_[m].mins, bounds + m * 6, 3 * sizeof(float));
    std::memcpy(models_[m].maxs, bounds + m * 6 + 3, 3 * sizeof(float));
  }
}

const Hull& CollisionWorld::HullForBox(const CModel& m, const float* mins,
                                       const float* maxs,
                                       float* offset) const {
  float size[3] = {maxs[0] - mins[0], maxs[1] - mins[1], maxs[2] - mins[2]};
  int h = size[0] < 3.0f ? 0 : (size[0] <= 32.0f ? 1 : 2);
  const Hull& hull = m.hulls[h];
  // offset moves the trace into hull space: hull clip box replaces the
  // entity box, so the start/end points shift by the difference
  for (int i = 0; i < 3; i++) offset[i] = hull.clip_mins[i] - mins[i];
  return hull;
}

int CollisionWorld::HullPointContents(const Hull& h, int num, const float* p) {
  while (num >= 0) {
    const ClipNode& node = h.clipnodes[num];
    const Plane& plane = h.planes[node.planenum];
    float d = plane.normal[0] * p[0] + plane.normal[1] * p[1] +
              plane.normal[2] * p[2] - plane.dist;
    num = node.children[d < 0.0f ? 1 : 0];
  }
  return num;
}

bool CollisionWorld::RecursiveHullCheck(const Hull& h, int num, float p1f,
                                        float p2f, const float* p1,
                                        const float* p2, Trace* trace) {
  if (num < 0) {  // leaf
    if (num != CONTENTS_SOLID) {
      trace->allsolid = false;
      if (num == CONTENTS_EMPTY)
        trace->inopen = true;
      else
        trace->inwater = true;
    } else {
      trace->startsolid = true;
    }
    return true;  // empty leaf: keep the segment
  }

  const ClipNode& node = h.clipnodes[num];
  const Plane& plane = h.planes[node.planenum];
  float t1 = plane.normal[0] * p1[0] + plane.normal[1] * p1[1] +
             plane.normal[2] * p1[2] - plane.dist;
  float t2 = plane.normal[0] * p2[0] + plane.normal[1] * p2[1] +
             plane.normal[2] * p2[2] - plane.dist;

  if (t1 >= 0.0f && t2 >= 0.0f)
    return RecursiveHullCheck(h, node.children[0], p1f, p2f, p1, p2, trace);
  if (t1 < 0.0f && t2 < 0.0f)
    return RecursiveHullCheck(h, node.children[1], p1f, p2f, p1, p2, trace);

  // split the segment at the plane (with the classic epsilon nudged
  // toward the near side)
  float frac = t1 < 0.0f ? (t1 + DIST_EPSILON) / (t1 - t2)
                         : (t1 - DIST_EPSILON) / (t1 - t2);
  if (frac < 0.0f) frac = 0.0f;
  if (frac > 1.0f) frac = 1.0f;
  float midf = p1f + (p2f - p1f) * frac;
  float mid[3];
  for (int i = 0; i < 3; i++) mid[i] = p1[i] + frac * (p2[i] - p1[i]);
  int side = t1 < 0.0f ? 1 : 0;

  // near side first
  if (!RecursiveHullCheck(h, node.children[side], p1f, midf, p1, mid, trace))
    return false;

  if (HullPointContents(h, node.children[side ^ 1], mid) != CONTENTS_SOLID)
    return RecursiveHullCheck(h, node.children[side ^ 1], midf, p2f, mid, p2,
                              trace);

  if (trace->allsolid) return false;  // never got out of solid

  // the far side is solid: this plane is the impact surface
  if (side == 0) {
    trace->plane = plane;
  } else {
    trace->plane.normal[0] = -plane.normal[0];
    trace->plane.normal[1] = -plane.normal[1];
    trace->plane.normal[2] = -plane.normal[2];
    trace->plane.dist = -plane.dist;
  }

  // back the impact point out of the solid until it tests empty
  while (HullPointContents(h, h.firstclipnode, mid) == CONTENTS_SOLID) {
    frac -= 0.1f;
    if (frac < 0.0f) {
      trace->fraction = midf;
      std::memcpy(trace->endpos, mid, sizeof(mid));
      return false;
    }
    midf = p1f + (p2f - p1f) * frac;
    for (int i = 0; i < 3; i++) mid[i] = p1[i] + frac * (p2[i] - p1[i]);
  }
  trace->fraction = midf;
  std::memcpy(trace->endpos, mid, sizeof(mid));
  return false;
}

void CollisionWorld::MakeBoxHull(const float* mins, const float* maxs,
                                 BoxHull* out) {
  // six clipnodes, one per face; children alternate into the next node
  // or out to empty/solid
  for (int i = 0; i < 6; i++) {
    out->nodes[i].planenum = i;
    int side = i & 1;
    out->nodes[i].children[side] = CONTENTS_EMPTY;
    out->nodes[i].children[side ^ 1] = i == 5 ? CONTENTS_SOLID : i + 1;
    int axis = i >> 1;
    out->planes[i].normal[0] = axis == 0 ? 1.0f : 0.0f;
    out->planes[i].normal[1] = axis == 1 ? 1.0f : 0.0f;
    out->planes[i].normal[2] = axis == 2 ? 1.0f : 0.0f;
    out->planes[i].dist = side ? mins[axis] : maxs[axis];
  }
  out->hull.clipnodes = out->nodes;
  out->hull.planes = out->planes;
  out->hull.firstclipnode = 0;
  out->hull.lastclipnode = 5;
}

}  // namespace mqgame
