// QC builtin functions (the engine services progs.dat calls into),
// plus SV_movestep-style monster locomotion used by walkmove/movetogoal.
//
// Builtin numbers are the fixed progs v6 ABI the id1/Arcane-Dimensions
// game code is compiled against (SURVEY.md §2.5 "host loop / entity
// simulation"). Audio/network builtins capture events instead of
// playing/sending them — the reference runs quakespasm with an external
// audio backend too (meson snd_extern, SURVEY.md §2.1 build row).
#include <cmath>
#include <cstdio>
#include <cstring>

#include "host.h"

namespace mqgame {

namespace {

inline float Dot(const float* a, const float* b) {
  return a[0] * b[0] + a[1] * b[1] + a[2] * b[2];
}
inline void Copy(const float* a, float* o) {
  o[0] = a[0], o[1] = a[1], o[2] = a[2];
}
inline float Length(const float* a) { return std::sqrt(Dot(a, a)); }

void AngleVectorsB(const float* angles, float* fwd, float* right, float* up) {
  float yaw = angles[1] * (float)(M_PI / 180.0);
  float pitch = angles[0] * (float)(M_PI / 180.0);
  float roll = angles[2] * (float)(M_PI / 180.0);
  float sy = std::sin(yaw), cy = std::cos(yaw);
  float sp = std::sin(pitch), cp = std::cos(pitch);
  float sr = std::sin(roll), cr = std::cos(roll);
  if (fwd) {
    fwd[0] = cp * cy;
    fwd[1] = cp * sy;
    fwd[2] = -sp;
  }
  if (right) {
    right[0] = sr * sp * cy - cr * -sy;
    right[1] = sr * sp * sy - cr * cy;
    right[2] = sr * cp;
    right[0] = -right[0], right[1] = -right[1], right[2] = -right[2];
  }
  if (up) {
    up[0] = cr * sp * cy + sr * -sy;
    up[1] = cr * sp * sy + sr * cy;
    up[2] = cr * cp;
  }
}

float VecToYaw(const float* v) {
  if (v[0] == 0.0f && v[1] == 0.0f) return 0.0f;
  float yaw = std::atan2(v[1], v[0]) * (float)(180.0 / M_PI);
  if (yaw < 0.0f) yaw += 360.0f;
  return yaw;
}

float AngleMod(float a) {
  a = std::fmod(a, 360.0f);
  if (a < 0.0f) a += 360.0f;
  return a;
}

}  // namespace

// ---- SV_movestep: one discrete monster step with stair/edge rules ----
bool GameHost::CheckBottom(int ent) {
  float* mins_r = pr_.EdVector(ent, f_.mins);
  float* maxs_r = pr_.EdVector(ent, f_.maxs);
  float* org = pr_.EdVector(ent, f_.origin);
  float mins[3], maxs[3];
  for (int i = 0; i < 3; i++) mins[i] = org[i] + mins_r[i];
  for (int i = 0; i < 3; i++) maxs[i] = org[i] + maxs_r[i];

  // fast check: all four corners solid just below
  float start[3];
  start[2] = mins[2] - 1.0f;
  bool all_solid = true;
  for (int x = 0; x <= 1 && all_solid; x++)
    for (int y = 0; y <= 1 && all_solid; y++) {
      start[0] = x ? maxs[0] : mins[0];
      start[1] = y ? maxs[1] : mins[1];
      if (PointContents(start) != CONTENTS_SOLID) all_solid = false;
    }
  if (all_solid) return true;

  // expensive check: center trace down, then corners vs the step size
  start[0] = (mins[0] + maxs[0]) * 0.5f;
  start[1] = (mins[1] + maxs[1]) * 0.5f;
  start[2] = mins[2];
  float stop[3] = {start[0], start[1], start[2] - 2.0f * 18.0f};
  float zero3[3] = {0, 0, 0};
  Trace trace = SVMove(start, zero3, zero3, stop, 1, ent);
  if (trace.fraction == 1.0f) return false;
  float mid = trace.endpos[2];
  float bottom = mid;
  for (int x = 0; x <= 1; x++)
    for (int y = 0; y <= 1; y++) {
      start[0] = stop[0] = x ? maxs[0] : mins[0];
      start[1] = stop[1] = y ? maxs[1] : mins[1];
      start[2] = mins[2];
      stop[2] = start[2] - 2.0f * 18.0f;
      Trace t = SVMove(start, zero3, zero3, stop, 1, ent);
      if (t.fraction != 1.0f && t.endpos[2] > bottom) bottom = t.endpos[2];
      if (t.fraction == 1.0f || mid - t.endpos[2] > 18.0f) return false;
    }
  return true;
}

bool GameHost::MoveStep(int ent, const float* move, bool relink) {
  float oldorg[3], neworg[3];
  float* org = pr_.EdVector(ent, f_.origin);
  Copy(org, oldorg);
  for (int i = 0; i < 3; i++) neworg[i] = org[i] + move[i];
  float* mins = pr_.EdVector(ent, f_.mins);
  float* maxs = pr_.EdVector(ent, f_.maxs);
  int flags = f_.flags >= 0 ? (int)pr_.EdFloat(ent, f_.flags) : 0;

  if (flags & (FL_SWIM | FL_FLY)) {
    // flying/swimming monsters: try the move at small up/down offsets
    for (int dz = 0; dz < 2; dz++) {
      for (int i = 0; i < 3; i++) neworg[i] = org[i] + move[i];
      neworg[2] += dz ? -8.0f : 8.0f;
      Trace t = SVMove(org, mins, maxs, neworg, 0, ent);
      if (t.fraction == 1.0f) {
        // swimmers must stay in water
        if (flags & FL_SWIM) {
          if (PointContents(t.endpos) == CONTENTS_EMPTY) continue;
        }
        Copy(t.endpos, org);
        if (relink) LinkEdict(ent, true);
        return true;
      }
    }
    return false;
  }

  // walking monster: push the step up, trace down twice the step
  neworg[2] += 18.0f;
  float end[3] = {neworg[0], neworg[1], neworg[2] - 2.0f * 18.0f};
  Trace trace = SVMove(neworg, mins, maxs, end, 0, ent);
  if (trace.allsolid) return false;
  if (trace.startsolid) {
    neworg[2] -= 18.0f;
    trace = SVMove(neworg, mins, maxs, end, 0, ent);
    if (trace.allsolid || trace.startsolid) return false;
  }
  if (trace.fraction == 1.0f) {
    // open air at the far end — only partial-ground entities drop
    if (flags & FL_PARTIALGROUND) {
      for (int i = 0; i < 3; i++) org[i] += move[i];
      if (relink) LinkEdict(ent, true);
      if (f_.flags >= 0)
        pr_.EdFloat(ent, f_.flags) = (float)(flags & ~FL_ONGROUND);
      return true;
    }
    return false;  // walked off an edge
  }
  Copy(trace.endpos, org);
  if (!CheckBottom(ent)) {
    if (flags & FL_PARTIALGROUND) {
      if (relink) LinkEdict(ent, true);
      return true;
    }
    Copy(oldorg, org);
    return false;
  }
  if (f_.flags >= 0)
    pr_.EdFloat(ent, f_.flags) = (float)(flags & ~FL_PARTIALGROUND);
  if (f_.groundentity >= 0 && trace.ent >= 0)
    pr_.EdInt(ent, f_.groundentity) = trace.ent;
  if (relink) LinkEdict(ent, true);
  return true;
}

namespace {

// SV_StepDirection: face the yaw, take the step
bool StepDirection(GameHost* host, Progs& pr, const FieldOfs& f, int ent,
                   float yaw, float dist) {
  if (f.ideal_yaw >= 0) pr.EdFloat(ent, f.ideal_yaw) = yaw;
  float rad = yaw * (float)(M_PI / 180.0);
  float move[3] = {std::cos(rad) * dist, std::sin(rad) * dist, 0.0f};
  return host->MoveStepPublic(ent, move, true);
}

}  // namespace

bool GameHost::MoveStepPublic(int ent, const float* move, bool relink) {
  return MoveStep(ent, move, relink);
}

// SV_NewChaseDir: pick a direction toward the goal with 45° fallbacks
void GameHost::NewChaseDir(int actor, int goal, float dist) {
  float* aorg = pr_.EdVector(actor, f_.origin);
  float* gorg = pr_.EdVector(goal, f_.origin);
  float olddir = f_.ideal_yaw >= 0
                     ? AngleMod((float)((int)(pr_.EdFloat(actor, f_.ideal_yaw) /
                                              45.0f) *
                                        45.0f))
                     : 0.0f;
  float turnaround = AngleMod(olddir - 180.0f);
  float dx = gorg[0] - aorg[0];
  float dy = gorg[1] - aorg[1];
  float d1 = dx > 10.0f ? 0.0f : (dx < -10.0f ? 180.0f : -1.0f);
  float d2 = dy < -10.0f ? 270.0f : (dy > 10.0f ? 90.0f : -1.0f);

  // direct diagonal
  if (d1 != -1.0f && d2 != -1.0f) {
    float tdir = d1 == 0.0f ? (d2 == 90.0f ? 45.0f : 315.0f)
                            : (d2 == 90.0f ? 135.0f : 215.0f);
    if (tdir != turnaround && StepDirection(this, pr_, f_, actor, tdir, dist))
      return;
  }
  // try major directions (randomize order half the time)
  if (((rng_state_ = rng_state_ * 1103515245u + 12345u) & 8) ||
      std::fabs(dy) > std::fabs(dx)) {
    float t = d1;
    d1 = d2;
    d2 = t;
  }
  if (d1 != -1.0f && d1 != turnaround &&
      StepDirection(this, pr_, f_, actor, d1, dist))
    return;
  if (d2 != -1.0f && d2 != turnaround &&
      StepDirection(this, pr_, f_, actor, d2, dist))
    return;
  if (olddir != -1.0f && StepDirection(this, pr_, f_, actor, olddir, dist))
    return;
  // 45° sweep
  bool flip = (rng_state_ = rng_state_ * 1103515245u + 12345u) & 1;
  for (int i = 0; i <= 315; i += 45) {
    float tdir = flip ? (float)i : (float)(315 - i);
    if (tdir != turnaround && StepDirection(this, pr_, f_, actor, tdir, dist))
      return;
  }
  if (turnaround != -1.0f &&
      StepDirection(this, pr_, f_, actor, turnaround, dist))
    return;
  if (f_.ideal_yaw >= 0) pr_.EdFloat(actor, f_.ideal_yaw) = olddir;
  // stuck: ensure still on valid ground
  if (!CheckBottom(actor) && f_.flags >= 0)
    pr_.EdFloat(actor, f_.flags) =
        (float)((int)pr_.EdFloat(actor, f_.flags) | FL_PARTIALGROUND);
}

void GameHost::RegisterBuiltins() {
  auto set_trace = [this](const Trace& t) {
    if (g_.trace_allsolid >= 0) pr_.GFloat(g_.trace_allsolid) = t.allsolid;
    if (g_.trace_startsolid >= 0)
      pr_.GFloat(g_.trace_startsolid) = t.startsolid;
    if (g_.trace_fraction >= 0) pr_.GFloat(g_.trace_fraction) = t.fraction;
    if (g_.trace_inopen >= 0) pr_.GFloat(g_.trace_inopen) = t.inopen;
    if (g_.trace_inwater >= 0) pr_.GFloat(g_.trace_inwater) = t.inwater;
    if (g_.trace_endpos >= 0) Copy(t.endpos, pr_.GVector(g_.trace_endpos));
    if (g_.trace_plane_normal >= 0)
      Copy(t.plane.normal, pr_.GVector(g_.trace_plane_normal));
    if (g_.trace_plane_dist >= 0)
      pr_.GFloat(g_.trace_plane_dist) = t.plane.dist;
    if (g_.trace_ent >= 0) pr_.GInt(g_.trace_ent) = t.ent < 0 ? 0 : t.ent;
  };

  // 1 makevectors(angles)
  pr_.SetBuiltin(1, [this](Progs& p) {
    float fwd[3], right[3], up[3];
    AngleVectorsB(p.ParmVector(0), fwd, right, up);
    if (g_.v_forward >= 0) Copy(fwd, p.GVector(g_.v_forward));
    if (g_.v_right >= 0) Copy(right, p.GVector(g_.v_right));
    if (g_.v_up >= 0) Copy(up, p.GVector(g_.v_up));
  });
  // 2 setorigin(e, org)
  pr_.SetBuiltin(2, [this](Progs& p) {
    int e = p.ParmInt(0);
    Copy(p.ParmVector(1), p.EdVector(e, f_.origin));
    LinkEdict(e, false);
  });
  // 3 setmodel(e, model)
  pr_.SetBuiltin(3, [this](Progs& p) {
    int e = p.ParmInt(0);
    std::string name = p.ParmStr(1);
    int idx = -1;
    for (size_t i = 0; i < model_names_.size(); i++)
      if (model_names_[i] == name) {
        idx = (int)i;
        break;
      }
    if (idx < 0) {
      model_names_.push_back(name);
      idx = (int)model_names_.size() - 1;
    }
    if (f_.model >= 0) p.EdInt(e, f_.model) = p.ParmInt(1);
    if (f_.modelindex >= 0) p.EdFloat(e, f_.modelindex) = (float)idx;
    // brush models get their hull bounds; others use registered bounds
    // (or stay zero until QC calls setsize — matches SV_SetModel)
    if (!name.empty() && name[0] == '*') {
      int cm = atoi(name.c_str() + 1);
      if (cm >= 0 && cm < world_.NumModels())
        SetMinMaxSize(e, world_.Model(cm).mins, world_.Model(cm).maxs);
    } else {
      auto it = model_bounds_.find(name);
      if (it != model_bounds_.end())
        SetMinMaxSize(e, it->second.data(), it->second.data() + 3);
      else
        LinkEdict(e, false);
    }
  });
  // 4 setsize(e, mins, maxs)
  pr_.SetBuiltin(4, [this](Progs& p) {
    SetMinMaxSize(p.ParmInt(0), p.ParmVector(1), p.ParmVector(2));
  });
  // 6 break
  pr_.SetBuiltin(6, [](Progs& p) { p.RuntimeError("break statement"); });
  // 7 random() in (0, 1)
  pr_.SetBuiltin(7, [this](Progs& p) {
    rng_state_ = rng_state_ * 1103515245u + 12345u;
    p.ReturnFloat(((rng_state_ >> 16) & 0x7fff) / 32768.0f);
  });
  // 8 sound(e, chan, sample, vol, atten)
  pr_.SetBuiltin(8, [this](Progs& p) {
    FrameEvents::Sound s;
    s.ent = p.ParmInt(0);
    s.channel = (int)p.ParmFloat(1);
    s.sample = p.ParmStr(2);
    s.volume = p.ParmFloat(3);
    s.attenuation = p.ParmFloat(4);
    Copy(p.EdVector(s.ent, f_.origin), s.origin);
    events_.sounds.push_back(std::move(s));
  });
  // 9 normalize(v)
  pr_.SetBuiltin(9, [](Progs& p) {
    float* v = p.ParmVector(0);
    float l = Length(v);
    float out[3] = {0, 0, 0};
    if (l > 0.0f) {
      out[0] = v[0] / l, out[1] = v[1] / l, out[2] = v[2] / l;
    }
    p.ReturnVector(out);
  });
  // 10 error(s), 11 objerror(s)
  pr_.SetBuiltin(10, [](Progs& p) {
    p.RuntimeError(std::string("QC error(): ") + p.ParmStr(0));
  });
  pr_.SetBuiltin(11, [this](Progs& p) {
    // objerror removes self but keeps running in the original
    int self = p.GInt(g_.self);
    events_.prints.push_back(std::string("objerror: ") + p.ParmStr(0));
    p.FreeEdict(self, time_);
  });
  // 12 vlen(v)
  pr_.SetBuiltin(12, [](Progs& p) { p.ReturnFloat(Length(p.ParmVector(0))); });
  // 13 vectoyaw(v)
  pr_.SetBuiltin(13, [](Progs& p) { p.ReturnFloat(VecToYaw(p.ParmVector(0))); });
  // 14 spawn()
  pr_.SetBuiltin(14, [this](Progs& p) { p.ReturnInt(p.AllocEdict(time_)); });
  // 15 remove(e)
  pr_.SetBuiltin(15, [this](Progs& p) { p.FreeEdict(p.ParmInt(0), time_); });
  // 16 traceline(v1, v2, nomonsters, forent)
  pr_.SetBuiltin(16, [this, set_trace](Progs& p) {
    float zero3[3] = {0, 0, 0};
    Trace t = SVMove(p.ParmVector(0), zero3, zero3, p.ParmVector(1),
                     (int)p.ParmFloat(2), p.ParmInt(3));
    set_trace(t);
  });
  // 17 checkclient()
  pr_.SetBuiltin(17, [this](Progs& p) {
    p.ReturnInt(pr_.Ed(player_).free ? 0 : player_);
  });
  // 18 find(start, field, match)
  pr_.SetBuiltin(18, [this](Progs& p) {
    int start = p.ParmInt(0);
    int fofs = p.ParmInt(1);
    const char* match = p.ParmStr(2);
    for (int i = start + 1; i < p.NumEdicts(); i++) {
      if (p.Ed(i).free) continue;
      const char* v = p.Str(p.EdInt(i, fofs));
      if (!strcmp(v, match)) {
        p.ReturnInt(i);
        return;
      }
    }
    p.ReturnInt(0);
  });
  // 19/20/75/76/77/68 precaches
  pr_.SetBuiltin(19, [this](Progs& p) {
    std::string s = p.ParmStr(0);
    bool found = false;
    for (auto& n : sound_names_) found = found || n == s;
    if (!found) sound_names_.push_back(s);
    p.ReturnInt(p.ParmInt(0));
  });
  pr_.SetBuiltin(20, [this](Progs& p) {
    std::string s = p.ParmStr(0);
    bool found = false;
    for (auto& n : model_names_) found = found || n == s;
    if (!found) model_names_.push_back(s);
    p.ReturnInt(p.ParmInt(0));
  });
  pr_.SetBuiltin(68, [](Progs& p) { p.ReturnInt(p.ParmInt(0)); });
  // 21 stuffcmd(client, s)
  pr_.SetBuiltin(21, [this](Progs& p) {
    events_.prints.push_back(std::string("stuffcmd: ") + p.ParmStr(1));
  });
  // 22 findradius(org, rad) → chain
  pr_.SetBuiltin(22, [this](Progs& p) {
    float* org = p.ParmVector(0);
    float rad = p.ParmFloat(1);
    int chain = 0;
    for (int i = 1; i < p.NumEdicts(); i++) {
      if (p.Ed(i).free) continue;
      if ((int)p.EdFloat(i, f_.solid) == SOLID_NOT) continue;
      float* eorg = p.EdVector(i, f_.origin);
      float* mins = p.EdVector(i, f_.mins);
      float* maxs = p.EdVector(i, f_.maxs);
      float d[3];
      for (int k = 0; k < 3; k++)
        d[k] = org[k] - (eorg[k] + (mins[k] + maxs[k]) * 0.5f);
      if (Length(d) > rad) continue;
      if (f_.chain >= 0) p.EdInt(i, f_.chain) = chain;
      chain = i;
    }
    p.ReturnInt(chain);
  });
  // 23 bprint, 24 sprint, 25 dprint, 73 centerprint
  pr_.SetBuiltin(23, [this](Progs& p) {
    events_.prints.push_back(p.ParmStr(0));
  });
  pr_.SetBuiltin(24, [this](Progs& p) {
    events_.prints.push_back(p.ParmStr(1));
  });
  pr_.SetBuiltin(25, [this](Progs& p) {
    events_.prints.push_back(std::string("dprint: ") + p.ParmStr(0));
  });
  pr_.SetBuiltin(73, [this](Progs& p) {
    events_.centerprints.push_back(p.ParmStr(1));
  });
  // 26 ftos, 27 vtos
  pr_.SetBuiltin(26, [](Progs& p) {
    char buf[32];
    float v = p.ParmFloat(0);
    if (v == (int)v)
      snprintf(buf, sizeof buf, "%d", (int)v);
    else
      snprintf(buf, sizeof buf, "%5.1f", v);
    p.ReturnInt(p.NewString(buf));
  });
  pr_.SetBuiltin(27, [](Progs& p) {
    char buf[64];
    float* v = p.ParmVector(0);
    snprintf(buf, sizeof buf, "'%5.1f %5.1f %5.1f'", v[0], v[1], v[2]);
    p.ReturnInt(p.NewString(buf));
  });
  // 28 coredump, 29 traceon, 30 traceoff, 31 eprint — debug no-ops
  for (int n : {28, 29, 30, 31}) pr_.SetBuiltin(n, [](Progs&) {});
  // 32 walkmove(yaw, dist)
  pr_.SetBuiltin(32, [this](Progs& p) {
    int ent = p.GInt(g_.self);
    float yaw = p.ParmFloat(0) * (float)(M_PI / 180.0);
    float dist = p.ParmFloat(1);
    int flags = f_.flags >= 0 ? (int)p.EdFloat(ent, f_.flags) : 0;
    if (!(flags & (FL_ONGROUND | FL_FLY | FL_SWIM))) {
      p.ReturnFloat(0.0f);
      return;
    }
    float move[3] = {std::cos(yaw) * dist, std::sin(yaw) * dist, 0.0f};
    p.ReturnFloat(MoveStep(ent, move, true) ? 1.0f : 0.0f);
  });
  // 34 droptofloor()
  pr_.SetBuiltin(34, [this](Progs& p) {
    int ent = p.GInt(g_.self);
    float* org = p.EdVector(ent, f_.origin);
    float end[3] = {org[0], org[1], org[2] - 256.0f};
    Trace t = SVMove(org, p.EdVector(ent, f_.mins), p.EdVector(ent, f_.maxs),
                     end, 0, ent);
    if (t.fraction == 1.0f || t.allsolid) {
      p.ReturnFloat(0.0f);
      return;
    }
    Copy(t.endpos, org);
    LinkEdict(ent, false);
    if (f_.flags >= 0)
      p.EdFloat(ent, f_.flags) =
          (float)((int)p.EdFloat(ent, f_.flags) | FL_ONGROUND);
    if (f_.groundentity >= 0 && t.ent >= 0)
      p.EdInt(ent, f_.groundentity) = t.ent;
    p.ReturnFloat(1.0f);
  });
  // 35 lightstyle(style, value)
  pr_.SetBuiltin(35, [this](Progs& p) {
    int i = (int)p.ParmFloat(0);
    if (i >= 0 && i < (int)lightstyles_.size()) lightstyles_[i] = p.ParmStr(1);
  });
  // 36 rint, 37 floor, 38 ceil, 43 fabs
  pr_.SetBuiltin(36, [](Progs& p) {
    float v = p.ParmFloat(0);
    p.ReturnFloat(v > 0.0f ? (float)(int)(v + 0.5f) : (float)(int)(v - 0.5f));
  });
  pr_.SetBuiltin(37, [](Progs& p) { p.ReturnFloat(std::floor(p.ParmFloat(0))); });
  pr_.SetBuiltin(38, [](Progs& p) { p.ReturnFloat(std::ceil(p.ParmFloat(0))); });
  pr_.SetBuiltin(43, [](Progs& p) { p.ReturnFloat(std::fabs(p.ParmFloat(0))); });
  // 40 checkbottom(e)
  pr_.SetBuiltin(40, [this](Progs& p) {
    p.ReturnFloat(CheckBottom(p.ParmInt(0)) ? 1.0f : 0.0f);
  });
  // 41 pointcontents(v)
  pr_.SetBuiltin(41, [this](Progs& p) {
    p.ReturnFloat((float)PointContents(p.ParmVector(0)));
  });
  // 44 aim(e, missilespeed) — no auto-aim: straight v_forward
  pr_.SetBuiltin(44, [this](Progs& p) {
    if (g_.v_forward >= 0)
      p.ReturnVector(p.GVector(g_.v_forward));
    else {
      float d[3] = {1, 0, 0};
      p.ReturnVector(d);
    }
  });
  // 45 cvar(s), 72 cvar_set(s, v)
  pr_.SetBuiltin(45, [this](Progs& p) { p.ReturnFloat(Cvar(p.ParmStr(0))); });
  pr_.SetBuiltin(72, [this](Progs& p) {
    cvars_[p.ParmStr(0)] = (float)atof(p.ParmStr(1));
  });
  // 46 localcmd(s)
  pr_.SetBuiltin(46, [this](Progs& p) {
    events_.prints.push_back(std::string("localcmd: ") + p.ParmStr(0));
  });
  // 47 nextent(e)
  pr_.SetBuiltin(47, [](Progs& p) {
    for (int i = p.ParmInt(0) + 1; i < p.NumEdicts(); i++)
      if (!p.Ed(i).free) {
        p.ReturnInt(i);
        return;
      }
    p.ReturnInt(0);
  });
  // 48 particle(org, dir, color, count)
  pr_.SetBuiltin(48, [this](Progs& p) {
    FrameEvents::ParticleEvent ev;
    Copy(p.ParmVector(0), ev.org);
    Copy(p.ParmVector(1), ev.dir);
    ev.color = p.ParmFloat(2);
    ev.count = p.ParmFloat(3);
    events_.particles.push_back(ev);
  });
  // 49 ChangeYaw()
  pr_.SetBuiltin(49, [this](Progs& p) {
    int ent = p.GInt(g_.self);
    float* angles = p.EdVector(ent, f_.angles);
    float current = AngleMod(angles[1]);
    float ideal = f_.ideal_yaw >= 0 ? p.EdFloat(ent, f_.ideal_yaw) : current;
    float speed = f_.yaw_speed >= 0 ? p.EdFloat(ent, f_.yaw_speed) : 20.0f;
    if (current == ideal) return;
    float move = ideal - current;
    if (ideal > current) {
      if (move >= 180.0f) move -= 360.0f;
    } else {
      if (move <= -180.0f) move += 360.0f;
    }
    if (move > 0.0f) {
      if (move > speed) move = speed;
    } else {
      if (move < -speed) move = -speed;
    }
    angles[1] = AngleMod(current + move);
  });
  // 51 vectoangles(v)
  pr_.SetBuiltin(51, [](Progs& p) {
    float* v = p.ParmVector(0);
    float out[3] = {0, 0, 0};
    if (v[1] == 0.0f && v[0] == 0.0f) {
      out[0] = v[2] > 0.0f ? 90.0f : 270.0f;
    } else {
      out[1] = std::atan2(v[1], v[0]) * (float)(180.0 / M_PI);
      if (out[1] < 0.0f) out[1] += 360.0f;
      float fw = std::sqrt(v[0] * v[0] + v[1] * v[1]);
      out[0] = std::atan2(v[2], fw) * (float)(180.0 / M_PI);
      if (out[0] < 0.0f) out[0] += 360.0f;
    }
    p.ReturnVector(out);
  });
  // 52-59 Write* — network messages; captured as no-ops (single local
  // client consumes state directly via the snapshot API)
  for (int n = 52; n <= 59; n++) pr_.SetBuiltin(n, [](Progs&) {});
  // 67 movetogoal(dist)
  pr_.SetBuiltin(67, [this](Progs& p) {
    int ent = p.GInt(g_.self);
    int goal = f_.goalentity >= 0 ? p.EdInt(ent, f_.goalentity) : 0;
    float dist = p.ParmFloat(0);
    int flags = f_.flags >= 0 ? (int)p.EdFloat(ent, f_.flags) : 0;
    if (!(flags & (FL_ONGROUND | FL_FLY | FL_SWIM))) return;
    // bump into the goal sometimes → let QC close the kill
    float* ao = p.EdVector(ent, f_.origin);
    float* go = p.EdVector(goal, f_.origin);
    float d[3];
    for (int k = 0; k < 3; k++) d[k] = go[k] - ao[k];
    int enemy = f_.enemy >= 0 ? p.EdInt(ent, f_.enemy) : 0;
    if (enemy != 0 && Length(d) < dist) return;
    rng_state_ = rng_state_ * 1103515245u + 12345u;
    float ideal = f_.ideal_yaw >= 0 ? p.EdFloat(ent, f_.ideal_yaw) : 0.0f;
    if (((rng_state_ >> 16) & 3) == 1 ||
        !StepDirection(this, p, f_, ent, ideal, dist))
      NewChaseDir(ent, goal, dist);
  });
  // 69 makestatic(e): snapshot and free
  pr_.SetBuiltin(69, [this](Progs& p) {
    int e = p.ParmInt(0);
    StaticEnt s;
    Copy(p.EdVector(e, f_.origin), s.origin);
    Copy(p.EdVector(e, f_.angles), s.angles);
    s.modelindex =
        f_.modelindex >= 0 ? (int)p.EdFloat(e, f_.modelindex) : 0;
    s.frame = f_.frame >= 0 ? (int)p.EdFloat(e, f_.frame) : 0;
    s.skin = f_.skin >= 0 ? (int)p.EdFloat(e, f_.skin) : 0;
    statics_.push_back(s);
    p.FreeEdict(e, time_);
  });
  // 70 changelevel(map)
  pr_.SetBuiltin(70, [this](Progs& p) {
    changelevel_ = p.ParmStr(0);
  });
  // 74 ambientsound(pos, sample, vol, atten)
  pr_.SetBuiltin(74, [this](Progs& p) {
    FrameEvents::Sound s;
    s.ent = -1;
    s.channel = -1;
    Copy(p.ParmVector(0), s.origin);
    s.sample = p.ParmStr(1);
    s.volume = p.ParmFloat(2);
    s.attenuation = p.ParmFloat(3);
    ambient_sounds_.push_back(std::move(s));
  });
  pr_.SetBuiltin(75, [this](Progs& p) {
    std::string s = p.ParmStr(0);
    bool found = false;
    for (auto& n : model_names_) found = found || n == s;
    if (!found) model_names_.push_back(s);
    p.ReturnInt(p.ParmInt(0));
  });
  pr_.SetBuiltin(76, [this](Progs& p) {
    std::string s = p.ParmStr(0);
    bool found = false;
    for (auto& n : sound_names_) found = found || n == s;
    if (!found) sound_names_.push_back(s);
    p.ReturnInt(p.ParmInt(0));
  });
  pr_.SetBuiltin(77, [](Progs& p) { p.ReturnInt(p.ParmInt(0)); });
  // 78 setspawnparms(e)
  pr_.SetBuiltin(78, [](Progs&) {});
}

}  // namespace mqgame
