// Game host engine glue — see host.h.
#include "host.h"

#include <cmath>
#include <cstdio>
#include <cstring>

namespace mqgame {

namespace {

constexpr float STEPSIZE = 18.0f;
constexpr float STOP_EPSILON = 0.1f;

void AngleVectors(const float* angles, float* fwd, float* right, float* up) {
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
    right[0] = -sr * sp * cy + cr * sy;
    right[1] = -sr * sp * sy - cr * cy;
    right[2] = -sr * cp;
    // classic right is (-1 * left)
    right[0] = -right[0], right[1] = -right[1], right[2] = -right[2];
  }
  if (up) {
    up[0] = cr * sp * cy + sr * sy;
    up[1] = cr * sp * sy - sr * cy;
    up[2] = cr * cp;
  }
}

inline float Dot(const float* a, const float* b) {
  return a[0] * b[0] + a[1] * b[1] + a[2] * b[2];
}
inline void Copy(const float* a, float* o) {
  o[0] = a[0], o[1] = a[1], o[2] = a[2];
}
inline void Add(const float* a, const float* b, float* o) {
  o[0] = a[0] + b[0], o[1] = a[1] + b[1], o[2] = a[2] + b[2];
}
inline void Sub(const float* a, const float* b, float* o) {
  o[0] = a[0] - b[0], o[1] = a[1] - b[1], o[2] = a[2] - b[2];
}
inline void Scale(const float* a, float s, float* o) {
  o[0] = a[0] * s, o[1] = a[1] * s, o[2] = a[2] * s;
}
inline float Length(const float* a) { return std::sqrt(Dot(a, a)); }

// slide velocity along a plane; overbounce 1.0 = slide, 1.5 = bounce
int ClipVelocity(const float* in, const float* normal, float* out,
                 float overbounce) {
  int blocked = 0;
  if (normal[2] > 0) blocked |= 1;  // floor
  if (normal[2] == 0.0f) blocked |= 2;  // step/wall
  float backoff = Dot(in, normal) * overbounce;
  for (int i = 0; i < 3; i++) {
    float change = normal[i] * backoff;
    out[i] = in[i] - change;
    if (out[i] > -STOP_EPSILON && out[i] < STOP_EPSILON) out[i] = 0.0f;
  }
  return blocked;
}

const char* SkipToken(const char*& s, std::string* tok) {
  tok->clear();
  while (*s && (unsigned char)*s <= ' ') s++;
  if (!*s) return nullptr;
  if (*s == '"') {
    s++;
    while (*s && *s != '"') tok->push_back(*s++);
    if (*s == '"') s++;
    return tok->c_str();
  }
  while (*s && (unsigned char)*s > ' ' && *s != '"') tok->push_back(*s++);
  return tok->c_str();
}

}  // namespace

// ---------------------------------------------------------------- load

bool GameHost::LoadProgs(const uint8_t* data, size_t len, int max_edicts) {
  if (!pr_.Load(data, len)) {
    error_ = pr_.error();
    return false;
  }
  pr_.InitEdicts(max_edicts);
  auto F = [&](const char* n) { return pr_.FieldOfs(n); };
  f_.modelindex = F("modelindex");
  f_.absmin = F("absmin");
  f_.absmax = F("absmax");
  f_.ltime = F("ltime");
  f_.movetype = F("movetype");
  f_.solid = F("solid");
  f_.origin = F("origin");
  f_.oldorigin = F("oldorigin");
  f_.velocity = F("velocity");
  f_.angles = F("angles");
  f_.avelocity = F("avelocity");
  f_.punchangle = F("punchangle");
  f_.classname = F("classname");
  f_.model = F("model");
  f_.frame = F("frame");
  f_.skin = F("skin");
  f_.effects = F("effects");
  f_.mins = F("mins");
  f_.maxs = F("maxs");
  f_.size = F("size");
  f_.touch = F("touch");
  f_.use = F("use");
  f_.think = F("think");
  f_.blocked = F("blocked");
  f_.nextthink = F("nextthink");
  f_.groundentity = F("groundentity");
  f_.health = F("health");
  f_.flags = F("flags");
  f_.waterlevel = F("waterlevel");
  f_.watertype = F("watertype");
  f_.teleport_time = F("teleport_time");
  f_.ideal_yaw = F("ideal_yaw");
  f_.yaw_speed = F("yaw_speed");
  f_.goalentity = F("goalentity");
  f_.enemy = F("enemy");
  f_.spawnflags = F("spawnflags");
  f_.target = F("target");
  f_.targetname = F("targetname");
  f_.owner = F("owner");
  f_.movedir = F("movedir");
  f_.message = F("message");
  f_.view_ofs = F("view_ofs");
  f_.button0 = F("button0");
  f_.button1 = F("button1");
  f_.button2 = F("button2");
  f_.impulse = F("impulse");
  f_.fixangle = F("fixangle");
  f_.v_angle = F("v_angle");
  f_.idealpitch = F("idealpitch");
  f_.netname = F("netname");
  f_.aiment = F("aiment");
  f_.chain = F("chain");
  f_.deadflag = F("deadflag");
  f_.takedamage = F("takedamage");
  f_.items = F("items");
  f_.armorvalue = F("armorvalue");
  f_.currentammo = F("currentammo");
  f_.weaponframe = F("weaponframe");
  f_.weaponmodel = F("weaponmodel");
  f_.weapon = F("weapon");
  f_.armortype = F("armortype");
  f_.max_health = F("max_health");
  f_.frags = F("frags");
  f_.colormap = F("colormap");
  f_.team = F("team");
  f_.sounds = F("sounds");
  f_.dmg_take = F("dmg_take");
  f_.dmg_save = F("dmg_save");
  f_.dmg_inflictor = F("dmg_inflictor");
  f_.noise = F("noise");
  f_.noise1 = F("noise1");
  f_.noise2 = F("noise2");
  f_.noise3 = F("noise3");
  if (f_.origin < 0 || f_.movetype < 0 || f_.solid < 0 || f_.mins < 0) {
    error_ = "progs missing required entvars (origin/movetype/solid/mins)";
    return false;
  }

  auto G = [&](const char* n) { return pr_.GlobalOfs(n); };
  g_.self = G("self");
  g_.other = G("other");
  g_.world = G("world");
  g_.time = G("time");
  g_.frametime = G("frametime");
  g_.force_retouch = G("force_retouch");
  g_.mapname = G("mapname");
  g_.deathmatch = G("deathmatch");
  g_.coop = G("coop");
  g_.teamplay = G("teamplay");
  g_.serverflags = G("serverflags");
  g_.total_secrets = G("total_secrets");
  g_.total_monsters = G("total_monsters");
  g_.found_secrets = G("found_secrets");
  g_.killed_monsters = G("killed_monsters");
  g_.parm1 = G("parm1");
  g_.intermission_running = G("intermission_running");
  g_.intermission_exittime = G("intermission_exittime");
  g_.v_forward = G("v_forward");
  g_.v_up = G("v_up");
  g_.v_right = G("v_right");
  g_.trace_allsolid = G("trace_allsolid");
  g_.trace_startsolid = G("trace_startsolid");
  g_.trace_fraction = G("trace_fraction");
  g_.trace_endpos = G("trace_endpos");
  g_.trace_plane_normal = G("trace_plane_normal");
  g_.trace_plane_dist = G("trace_plane_dist");
  g_.trace_ent = G("trace_ent");
  g_.trace_inopen = G("trace_inopen");
  g_.trace_inwater = G("trace_inwater");
  g_.msg_entity = G("msg_entity");
  auto Fn = [&](const char* n) { return pr_.FunctionIndex(n); };
  g_.fn_main = Fn("main");
  g_.fn_StartFrame = Fn("StartFrame");
  g_.fn_PlayerPreThink = Fn("PlayerPreThink");
  g_.fn_PlayerPostThink = Fn("PlayerPostThink");
  g_.fn_ClientConnect = Fn("ClientConnect");
  g_.fn_PutClientInServer = Fn("PutClientInServer");
  g_.fn_ClientDisconnect = Fn("ClientDisconnect");
  g_.fn_SetNewParms = Fn("SetNewParms");
  if (g_.self < 0 || g_.time < 0) {
    error_ = "progs missing required globals (self/time)";
    return false;
  }

  // engine defaults (cvars the id1/AD progs read)
  cvars_ = {{"teamplay", 0},      {"skill", 1},        {"deathmatch", 0},
            {"coop", 0},          {"registered", 1},   {"sv_gravity", 800},
            {"sv_friction", 4},   {"sv_stopspeed", 100},
            {"sv_maxspeed", 320}, {"sv_accelerate", 10},
            {"sv_maxvelocity", 2000}, {"sv_nostep", 0},
            {"sv_aim", 1},        {"samelevel", 0},    {"noexit", 0},
            {"fraglimit", 0},     {"timelimit", 0},    {"temp1", 0},
            {"saved1", 0},        {"saved2", 0},       {"saved3", 0},
            {"saved4", 0},        {"savedgamecfg", 0}, {"scratch1", 0},
            {"scratch2", 0},      {"scratch3", 0},     {"scratch4", 0},
            {"developer", 0},     {"pr_checkextension", 0}};
  model_names_ = {""};
  sound_names_ = {""};
  for (auto& ls : lightstyles_) ls.clear();
  lightstyles_[0] = "m";
  RegisterBuiltins();
  loaded_ = true;
  return true;
}

void GameHost::LoadWorldHulls(const float* planes, int nplanes,
                              const int32_t* clipnodes, int nclipnodes,
                              const int32_t* headnodes, const float* bounds,
                              int nmodels) {
  world_.Load(planes, nplanes, clipnodes, nclipnodes, headnodes, bounds,
              nmodels);
}

void GameHost::SetModelBounds(const std::string& name, const float* mins,
                              const float* maxs) {
  std::array<float, 6> b;
  for (int i = 0; i < 3; i++) b[i] = mins[i], b[3 + i] = maxs[i];
  model_bounds_[name] = b;
}

float GameHost::Cvar(const std::string& name) const {
  auto it = cvars_.find(name);
  return it == cvars_.end() ? 0.0f : it->second;
}

void GameHost::CallFunction(int fn, int self_ent) {
  if (fn <= 0) return;
  pr_.GInt(g_.self) = self_ent;
  pr_.GFloat(g_.time) = time_;
  pr_.Execute(fn);
}

// ------------------------------------------------------------- spawning

void GameHost::SetMinMaxSize(int ent, const float* mins, const float* maxs) {
  Copy(mins, pr_.EdVector(ent, f_.mins));
  Copy(maxs, pr_.EdVector(ent, f_.maxs));
  if (f_.size >= 0) Sub(maxs, mins, pr_.EdVector(ent, f_.size));
  LinkEdict(ent, false);
}

int GameHost::ParseEdict(const char*& s, int ent) {
  std::string tok, key, val;
  // expect {
  if (!SkipToken(s, &tok) || tok != "{") return -1;
  while (true) {
    if (!SkipToken(s, &key)) return -1;
    if (key == "}") break;
    if (!SkipToken(s, &val)) return -1;
    if (key.empty() || key[0] == '_') continue;
    if (key == "angle") {
      key = "angles";
      val = "0 " + val + " 0";
    }
    if (key == "light") key = "light_lev";  // classic alias
    int fofs = pr_.FieldOfs(key);
    if (fofs < 0) continue;  // unknown keys are ignored (ED_ParseField)
    switch (pr_.FieldType(key)) {
      case ev_string:
        pr_.EdInt(ent, fofs) = pr_.NewString(val);
        break;
      case ev_float:
        pr_.EdFloat(ent, fofs) = (float)atof(val.c_str());
        break;
      case ev_vector: {
        float v[3] = {0, 0, 0};
        sscanf(val.c_str(), "%f %f %f", &v[0], &v[1], &v[2]);
        Copy(v, pr_.EdVector(ent, fofs));
        break;
      }
      case ev_entity:
        pr_.EdInt(ent, fofs) = atoi(val.c_str());
        break;
      case ev_function: {
        int fn = pr_.FunctionIndex(val);
        pr_.EdInt(ent, fofs) = fn < 0 ? 0 : fn;
        break;
      }
      default:
        break;
    }
  }
  return ent;
}

void GameHost::CallSpawn(int ent) {
  const char* classname =
      f_.classname >= 0 ? pr_.Str(pr_.EdInt(ent, f_.classname)) : "";
  int fn = pr_.FunctionIndex(classname);
  if (fn < 0) {
    // no spawn function: discard (ED_CallSpawn); the world edict stays
    if (ent != 0) pr_.FreeEdict(ent, time_);
    return;
  }
  CallFunction(fn, ent);
}

bool GameHost::SpawnServer(const std::string& entity_lump,
                           const std::string& mapname) {
  if (!loaded_) {
    error_ = "SpawnServer before LoadProgs";
    return false;
  }
  time_ = 1.0f;
  if (g_.mapname >= 0) pr_.GInt(g_.mapname) = pr_.NewString(mapname);
  if (g_.coop >= 0) pr_.GFloat(g_.coop) = Cvar("coop");
  if (g_.deathmatch >= 0) pr_.GFloat(g_.deathmatch) = Cvar("deathmatch");
  pr_.GFloat(g_.time) = time_;

  // precache slots 1..N for the world + inline submodels (classic
  // sv.model_precache layout)
  model_names_ = {"", mapname};
  for (int m = 1; m < world_.NumModels(); m++)
    model_names_.push_back("*" + std::to_string(m));

  // world edict: the map's collision model
  Edict& w = pr_.Ed(0);
  w.free = false;
  if (f_.model >= 0) pr_.EdInt(0, f_.model) = pr_.NewString(mapname);
  if (f_.modelindex >= 0) pr_.EdFloat(0, f_.modelindex) = 1;
  pr_.EdFloat(0, f_.solid) = SOLID_BSP;
  pr_.EdFloat(0, f_.movetype) = MOVETYPE_PUSH;
  if (world_.NumModels() > 0) {
    SetMinMaxSize(0, world_.Model(0).mins, world_.Model(0).maxs);
  }

  // reserve edict 1 for the local client before map entities spawn
  player_ = 1;
  pr_.Ed(1).free = false;

  const char* s = entity_lump.c_str();
  std::string probe;
  bool first = true;
  while (true) {
    const char* save = s;
    if (!SkipToken(s, &probe)) break;  // EOF
    if (probe != "{") {
      error_ = "entity lump: expected {";
      return false;
    }
    s = save;
    int ent = first ? 0 : pr_.AllocEdict(time_);
    if (ParseEdict(s, ent) < 0) {
      error_ = "entity lump: parse error";
      return false;
    }
    // classic ED_LoadFromFile order: every entity's spawn function runs
    // as it is parsed, worldspawn (the first block) included
    CallSpawn(ent);
    first = false;
    if (!pr_.ok()) {
      error_ = pr_.error();
      return false;
    }
  }
  return true;
}

bool GameHost::SpawnClient() {
  int e = player_;
  pr_.Ed(e).free = false;
  if (f_.colormap >= 0) pr_.EdFloat(e, f_.colormap) = (float)e;
  if (f_.team >= 0) pr_.EdFloat(e, f_.team) = 1;
  if (f_.netname >= 0) pr_.EdInt(e, f_.netname) = pr_.NewString("player");
  if (g_.fn_SetNewParms > 0) CallFunction(g_.fn_SetNewParms, e);
  if (g_.fn_ClientConnect > 0) CallFunction(g_.fn_ClientConnect, e);
  if (g_.fn_PutClientInServer > 0) CallFunction(g_.fn_PutClientInServer, e);
  if (!pr_.ok()) {
    error_ = pr_.error();
    return false;
  }
  return true;
}

// ---------------------------------------------------------------- world

void GameHost::LinkEdict(int ent, bool touch_triggers) {
  if (ent == 0 || f_.absmin < 0 || f_.absmax < 0) return;
  Edict& e = pr_.Ed(ent);
  if (e.free) return;
  float* org = pr_.EdVector(ent, f_.origin);
  float* mins = pr_.EdVector(ent, f_.mins);
  float* maxs = pr_.EdVector(ent, f_.maxs);
  float* amin = pr_.EdVector(ent, f_.absmin);
  float* amax = pr_.EdVector(ent, f_.absmax);
  Add(org, mins, amin);
  Add(org, maxs, amax);
  // classic fudge: expand by 1 so touching is generous
  for (int i = 0; i < 3; i++) amin[i] -= 1.0f, amax[i] += 1.0f;
  if (touch_triggers) TouchTriggers(ent);
}

void GameHost::TouchTriggers(int ent) {
  float* amin = pr_.EdVector(ent, f_.absmin);
  float* amax = pr_.EdVector(ent, f_.absmax);
  for (int i = 1; i < pr_.NumEdicts(); i++) {
    if (i == ent) continue;
    Edict& t = pr_.Ed(i);
    if (t.free) continue;
    if ((int)pr_.EdFloat(i, f_.solid) != SOLID_TRIGGER) continue;
    if (f_.touch < 0 || pr_.EdInt(i, f_.touch) <= 0) continue;
    float* tmin = pr_.EdVector(i, f_.absmin);
    float* tmax = pr_.EdVector(i, f_.absmax);
    bool overlap = true;
    for (int k = 0; k < 3; k++)
      overlap = overlap && amin[k] <= tmax[k] && amax[k] >= tmin[k];
    if (!overlap) continue;
    int old_self = pr_.GInt(g_.self), old_other = pr_.GInt(g_.other);
    pr_.GInt(g_.self) = i;
    pr_.GInt(g_.other) = ent;
    pr_.GFloat(g_.time) = time_;
    pr_.Execute(pr_.EdInt(i, f_.touch));
    pr_.GInt(g_.self) = old_self;
    pr_.GInt(g_.other) = old_other;
  }
}

int GameHost::PointContents(const float* p) {
  if (world_.NumModels() == 0) return CONTENTS_EMPTY;
  const Hull& h = world_.Model(0).hulls[0];
  return CollisionWorld::HullPointContents(h, h.firstclipnode, p);
}

Trace GameHost::ClipMoveToEntity(int ent, const float* start,
                                 const float* mins, const float* maxs,
                                 const float* end) {
  Trace trace;
  trace.fraction = 1.0f;
  trace.allsolid = true;
  Copy(end, trace.endpos);

  float offset[3];
  const Hull* hull;
  CollisionWorld::BoxHull box;
  float* eorg = pr_.EdVector(ent, f_.origin);
  if ((int)pr_.EdFloat(ent, f_.solid) == SOLID_BSP) {
    // brush model: pick a matching hull by box size
    int mi = f_.modelindex >= 0 ? (int)pr_.EdFloat(ent, f_.modelindex) : 0;
    const char* name =
        mi > 0 && mi < (int)model_names_.size() ? model_names_[mi].c_str() : "";
    int cm = 0;
    if (name[0] == '*') cm = atoi(name + 1);
    if (cm < 0 || cm >= world_.NumModels()) cm = 0;
    hull = &world_.HullForBox(world_.Model(cm), mins, maxs, offset);
    Add(offset, eorg, offset);
  } else {
    // box entity: expand its box by the move box
    float emin[3], emax[3];
    Sub(pr_.EdVector(ent, f_.mins), maxs, emin);
    Sub(pr_.EdVector(ent, f_.maxs), mins, emax);
    CollisionWorld::MakeBoxHull(emin, emax, &box);
    hull = &box.hull;
    Copy(eorg, offset);
  }

  float s1[3], e1[3];
  Sub(start, offset, s1);
  Sub(end, offset, e1);
  CollisionWorld::RecursiveHullCheck(*hull, hull->firstclipnode, 0.0f, 1.0f,
                                     s1, e1, &trace);
  if (trace.fraction != 1.0f) {
    Add(trace.endpos, offset, trace.endpos);
  } else {
    Copy(end, trace.endpos);
  }
  if (trace.fraction < 1.0f || trace.startsolid) trace.ent = ent;
  return trace;
}

Trace GameHost::SVMove(const float* start, const float* mins,
                       const float* maxs, const float* end, int type,
                       int passedict) {
  // world first
  Trace best = ClipMoveToEntity(0, start, mins, maxs, end);
  if (best.fraction < 1.0f || best.startsolid) best.ent = 0;

  // move box for quick rejects
  float bmin[3], bmax[3];
  for (int i = 0; i < 3; i++) {
    bmin[i] = std::fmin(start[i], end[i]) + mins[i] - 1.0f;
    bmax[i] = std::fmax(start[i], end[i]) + maxs[i] + 1.0f;
  }

  for (int i = 1; i < pr_.NumEdicts(); i++) {
    Edict& e = pr_.Ed(i);
    if (e.free || i == passedict) continue;
    int solid = (int)pr_.EdFloat(i, f_.solid);
    if (solid == SOLID_NOT || solid == SOLID_TRIGGER) continue;
    if (type == 1 /* MOVE_NOMONSTERS */ && solid != SOLID_BSP) continue;
    if (passedict >= 0 && f_.owner >= 0) {
      if (pr_.EdInt(i, f_.owner) == passedict) continue;   // own missiles
      if (pr_.EdInt(passedict, f_.owner) == i) continue;   // our owner
    }
    float* amin = pr_.EdVector(i, f_.absmin);
    float* amax = pr_.EdVector(i, f_.absmax);
    bool overlap = true;
    for (int k = 0; k < 3; k++)
      overlap = overlap && bmin[k] <= amax[k] && bmax[k] >= amin[k];
    if (!overlap) continue;
    Trace t = ClipMoveToEntity(i, start, mins, maxs, end);
    if (t.allsolid || t.startsolid || t.fraction < best.fraction) {
      t.ent = i;
      if (best.startsolid) {
        best = t;
        best.startsolid = true;
      } else {
        best = t;
      }
    }
  }
  return best;
}

bool GameHost::TestEntityPosition(int ent) {
  float* org = pr_.EdVector(ent, f_.origin);
  Trace t = SVMove(org, pr_.EdVector(ent, f_.mins),
                   pr_.EdVector(ent, f_.maxs), org, 0, ent);
  return t.startsolid;
}

// -------------------------------------------------------------- physics

void GameHost::Impact(int e1, int e2) {
  int old_self = pr_.GInt(g_.self), old_other = pr_.GInt(g_.other);
  pr_.GFloat(g_.time) = time_;
  if (f_.touch >= 0 && pr_.EdInt(e1, f_.touch) > 0 &&
      (int)pr_.EdFloat(e1, f_.solid) != SOLID_NOT) {
    pr_.GInt(g_.self) = e1;
    pr_.GInt(g_.other) = e2;
    pr_.Execute(pr_.EdInt(e1, f_.touch));
  }
  if (f_.touch >= 0 && pr_.EdInt(e2, f_.touch) > 0 &&
      (int)pr_.EdFloat(e2, f_.solid) != SOLID_NOT) {
    pr_.GInt(g_.self) = e2;
    pr_.GInt(g_.other) = e1;
    pr_.Execute(pr_.EdInt(e2, f_.touch));
  }
  pr_.GInt(g_.self) = old_self;
  pr_.GInt(g_.other) = old_other;
}

void GameHost::AddGravity(int ent, float dt) {
  float g = Cvar("sv_gravity");
  pr_.EdVector(ent, f_.velocity)[2] -= g * dt;
}

void GameHost::CheckVelocity(int ent) {
  float maxv = Cvar("sv_maxvelocity");
  float* v = pr_.EdVector(ent, f_.velocity);
  float* o = pr_.EdVector(ent, f_.origin);
  for (int i = 0; i < 3; i++) {
    if (std::isnan(v[i])) v[i] = 0.0f;
    if (std::isnan(o[i])) o[i] = 0.0f;
    if (v[i] > maxv) v[i] = maxv;
    if (v[i] < -maxv) v[i] = -maxv;
  }
}

bool GameHost::RunThink(int ent, float dt) {
  if (f_.nextthink < 0 || f_.think < 0) return true;
  float thinktime = pr_.EdFloat(ent, f_.nextthink);
  if (thinktime <= 0.0f || thinktime > time_ + dt) return true;
  if (thinktime < time_) thinktime = time_;  // never fire in the past
  pr_.EdFloat(ent, f_.nextthink) = 0.0f;
  pr_.GFloat(g_.time) = thinktime;
  int fn = pr_.EdInt(ent, f_.think);
  if (fn > 0) {
    pr_.GInt(g_.self) = ent;
    pr_.GInt(g_.other) = 0;
    pr_.Execute(fn);
  }
  return !pr_.Ed(ent).free;
}

// move an entity by `push`, impacting whatever it hits (SV_PushEntity)
Trace GameHost::SVMovePush(int ent, const float* push) {
  float* org = pr_.EdVector(ent, f_.origin);
  float end[3];
  Add(org, push, end);
  int mt = (int)pr_.EdFloat(ent, f_.movetype);
  int type = 0;
  if (mt == MOVETYPE_FLYMISSILE) type = 2;
  else if ((int)pr_.EdFloat(ent, f_.solid) == SOLID_TRIGGER ||
           (int)pr_.EdFloat(ent, f_.solid) == SOLID_NOT)
    type = 1;  // only clip against bmodels
  Trace t = SVMove(org, pr_.EdVector(ent, f_.mins),
                   pr_.EdVector(ent, f_.maxs), end, type, ent);
  Copy(t.endpos, org);
  LinkEdict(ent, true);
  if (t.ent >= 0) Impact(ent, t.ent);
  return t;
}

int GameHost::FlyMove(int ent, float dt, Trace* steptrace) {
  constexpr int MAX_CLIP_PLANES = 5;
  float original_velocity[3], primal_velocity[3], new_velocity[3];
  float planes[MAX_CLIP_PLANES][3];
  float* velocity = pr_.EdVector(ent, f_.velocity);
  float* origin = pr_.EdVector(ent, f_.origin);
  Copy(velocity, original_velocity);
  Copy(velocity, primal_velocity);
  int numplanes = 0, blocked = 0;
  float time_left = dt;

  for (int bump = 0; bump < 4; bump++) {
    if (velocity[0] == 0 && velocity[1] == 0 && velocity[2] == 0) break;
    float end[3];
    for (int i = 0; i < 3; i++) end[i] = origin[i] + time_left * velocity[i];
    Trace trace = SVMove(origin, pr_.EdVector(ent, f_.mins),
                         pr_.EdVector(ent, f_.maxs), end, 0, ent);
    if (getenv("MQ_PHYS_DEBUG"))
      fprintf(stderr,
              "flymove bump%d v=(%g %g %g) frac=%g allsolid=%d n=(%g %g %g) "
              "ent=%d\n",
              bump, velocity[0], velocity[1], velocity[2], trace.fraction,
              (int)trace.allsolid, trace.plane.normal[0],
              trace.plane.normal[1], trace.plane.normal[2], trace.ent);
    if (trace.allsolid) {  // trapped in a solid
      Scale(velocity, 0.0f, velocity);
      return 3;
    }
    if (trace.fraction > 0.0f) {
      Copy(trace.endpos, origin);
      Copy(velocity, original_velocity);
      numplanes = 0;
    }
    if (trace.fraction == 1.0f) break;
    if (trace.ent < 0) trace.ent = 0;

    if (trace.plane.normal[2] > 0.7f) {
      blocked |= 1;  // floor
      if ((int)pr_.EdFloat(trace.ent, f_.solid) == SOLID_BSP &&
          f_.flags >= 0) {
        pr_.EdFloat(ent, f_.flags) =
            (float)((int)pr_.EdFloat(ent, f_.flags) | FL_ONGROUND);
        if (f_.groundentity >= 0) pr_.EdInt(ent, f_.groundentity) = trace.ent;
      }
    }
    if (trace.plane.normal[2] == 0.0f) {
      blocked |= 2;  // step
      if (steptrace) *steptrace = trace;
    }

    Impact(ent, trace.ent);
    if (pr_.Ed(ent).free) break;

    time_left -= time_left * trace.fraction;
    if (numplanes >= MAX_CLIP_PLANES) {
      Scale(velocity, 0.0f, velocity);
      return 3;
    }
    Copy(trace.plane.normal, planes[numplanes]);
    numplanes++;

    // clip velocity to all touched planes: pick the first plane whose
    // clipped velocity does not re-enter any other plane
    int i;
    for (i = 0; i < numplanes; i++) {
      ClipVelocity(original_velocity, planes[i], new_velocity, 1.0f);
      int j;
      for (j = 0; j < numplanes; j++)
        if (j != i && Dot(new_velocity, planes[j]) < 0.0f) break;
      if (j == numplanes) break;  // acceptable: found our plane
    }
    if (i != numplanes) {
      // a good plane was found: slide along it
      Copy(new_velocity, velocity);
    } else {
      // no single plane works: slide along the crease of two planes
      if (numplanes != 2) {
        Scale(velocity, 0.0f, velocity);
        return 7;
      }
      float dir[3];
      dir[0] = planes[0][1] * planes[1][2] - planes[0][2] * planes[1][1];
      dir[1] = planes[0][2] * planes[1][0] - planes[0][0] * planes[1][2];
      dir[2] = planes[0][0] * planes[1][1] - planes[0][1] * planes[1][0];
      float d = Dot(dir, velocity);
      Scale(dir, d, velocity);
    }
    if (Dot(velocity, primal_velocity) <= 0.0f) {
      Scale(velocity, 0.0f, velocity);
      return blocked;
    }
  }
  return blocked;
}

void GameHost::PhysicsNoclip(int ent, float dt) {
  if (!RunThink(ent, dt)) return;
  float* a = pr_.EdVector(ent, f_.angles);
  float* av = f_.avelocity >= 0 ? pr_.EdVector(ent, f_.avelocity) : nullptr;
  if (av)
    for (int i = 0; i < 3; i++) a[i] += dt * av[i];
  float* o = pr_.EdVector(ent, f_.origin);
  float* v = pr_.EdVector(ent, f_.velocity);
  for (int i = 0; i < 3; i++) o[i] += dt * v[i];
  LinkEdict(ent, false);
}

void GameHost::PhysicsToss(int ent, float dt) {
  if (!RunThink(ent, dt)) return;
  int flags = f_.flags >= 0 ? (int)pr_.EdFloat(ent, f_.flags) : 0;
  if (flags & FL_ONGROUND) return;
  CheckVelocity(ent);
  int mt = (int)pr_.EdFloat(ent, f_.movetype);
  if (mt != MOVETYPE_FLY && mt != MOVETYPE_FLYMISSILE) AddGravity(ent, dt);
  float* a = pr_.EdVector(ent, f_.angles);
  if (f_.avelocity >= 0) {
    float* av = pr_.EdVector(ent, f_.avelocity);
    for (int i = 0; i < 3; i++) a[i] += dt * av[i];
  }
  float move[3];
  Scale(pr_.EdVector(ent, f_.velocity), dt, move);
  Trace trace = SVMovePush(ent, move);
  if (trace.fraction == 1.0f || pr_.Ed(ent).free) return;

  float backoff = mt == MOVETYPE_BOUNCE ? 1.5f : 1.0f;
  float* v = pr_.EdVector(ent, f_.velocity);
  ClipVelocity(v, trace.plane.normal, v, backoff);
  if (trace.plane.normal[2] > 0.7f) {
    if (v[2] < 60.0f || mt != MOVETYPE_BOUNCE) {
      if (f_.flags >= 0)
        pr_.EdFloat(ent, f_.flags) = (float)(flags | FL_ONGROUND);
      if (f_.groundentity >= 0) pr_.EdInt(ent, f_.groundentity) = trace.ent;
      Scale(v, 0.0f, v);
      if (f_.avelocity >= 0)
        Scale(pr_.EdVector(ent, f_.avelocity), 0.0f,
              pr_.EdVector(ent, f_.avelocity));
    }
  }
}

void GameHost::PhysicsStep(int ent, float dt) {
  int flags = f_.flags >= 0 ? (int)pr_.EdFloat(ent, f_.flags) : 0;
  if (!(flags & FL_ONGROUND)) {
    if (!(flags & (FL_FLY | FL_SWIM))) {
      bool hitsound = pr_.EdVector(ent, f_.velocity)[2] < Cvar("sv_gravity") * -0.1f;
      AddGravity(ent, dt);
      CheckVelocity(ent);
      FlyMove(ent, dt, nullptr);
      LinkEdict(ent, true);
      (void)hitsound;
    }
  }
  RunThink(ent, dt);
}

bool GameHost::PushMove(int pusher, float dt) {
  float* pvel = pr_.EdVector(pusher, f_.velocity);
  float lt = f_.ltime >= 0 ? pr_.EdFloat(pusher, f_.ltime) : 0.0f;
  if (pvel[0] == 0 && pvel[1] == 0 && pvel[2] == 0) {
    if (f_.ltime >= 0) pr_.EdFloat(pusher, f_.ltime) = lt + dt;
    return true;
  }
  float move[3];
  Scale(pvel, dt, move);
  float* porg = pr_.EdVector(pusher, f_.origin);
  float pushorig[3];
  Copy(porg, pushorig);
  Add(porg, move, porg);
  if (f_.ltime >= 0) pr_.EdFloat(pusher, f_.ltime) = lt + dt;
  LinkEdict(pusher, false);

  std::vector<std::pair<int, std::array<float, 3>>> moved;
  float* pmin = pr_.EdVector(pusher, f_.absmin);
  float* pmax = pr_.EdVector(pusher, f_.absmax);

  for (int i = 1; i < pr_.NumEdicts(); i++) {
    Edict& e = pr_.Ed(i);
    if (e.free) continue;
    int mt = (int)pr_.EdFloat(i, f_.movetype);
    if (mt == MOVETYPE_PUSH || mt == MOVETYPE_NONE || mt == MOVETYPE_NOCLIP)
      continue;
    int flags = f_.flags >= 0 ? (int)pr_.EdFloat(i, f_.flags) : 0;
    bool riding = (flags & FL_ONGROUND) && f_.groundentity >= 0 &&
                  pr_.EdInt(i, f_.groundentity) == pusher;
    if (!riding) {
      float* amin = pr_.EdVector(i, f_.absmin);
      float* amax = pr_.EdVector(i, f_.absmax);
      bool overlap = true;
      for (int k = 0; k < 3; k++)
        overlap = overlap && amin[k] < pmax[k] && amax[k] > pmin[k];
      if (!overlap) continue;
      if (!TestEntityPosition(i)) continue;  // not actually touching
    }
    if (mt != MOVETYPE_WALK && f_.flags >= 0)
      pr_.EdFloat(i, f_.flags) = (float)(flags & ~FL_ONGROUND);

    float* corg = pr_.EdVector(i, f_.origin);
    std::array<float, 3> entorig = {corg[0], corg[1], corg[2]};
    Add(corg, move, corg);
    LinkEdict(i, false);
    if (TestEntityPosition(i)) {
      // still blocked: revert everything and call .blocked
      Copy(entorig.data(), corg);
      LinkEdict(i, true);
      Copy(pushorig, porg);
      LinkEdict(pusher, false);
      if (f_.ltime >= 0) pr_.EdFloat(pusher, f_.ltime) = lt;
      for (auto& mrec : moved) {
        float* ro = pr_.EdVector(mrec.first, f_.origin);
        Copy(mrec.second.data(), ro);
        LinkEdict(mrec.first, false);
      }
      if (f_.blocked >= 0 && pr_.EdInt(pusher, f_.blocked) > 0) {
        pr_.GInt(g_.self) = pusher;
        pr_.GInt(g_.other) = i;
        pr_.GFloat(g_.time) = time_;
        pr_.Execute(pr_.EdInt(pusher, f_.blocked));
      }
      return false;
    }
    moved.push_back({i, entorig});
  }
  return true;
}

void GameHost::PhysicsPusher(int ent, float dt) {
  float oldltime = f_.ltime >= 0 ? pr_.EdFloat(ent, f_.ltime) : 0.0f;
  float thinktime = f_.nextthink >= 0 ? pr_.EdFloat(ent, f_.nextthink) : 0.0f;
  float movetime = dt;
  if (thinktime > 0.0f && thinktime < oldltime + dt) {
    movetime = thinktime - oldltime;
    if (movetime < 0.0f) movetime = 0.0f;
  }
  if (movetime > 0.0f) PushMove(ent, movetime);
  float newltime = f_.ltime >= 0 ? pr_.EdFloat(ent, f_.ltime) : 0.0f;
  if (thinktime > oldltime && thinktime <= newltime) {
    if (f_.nextthink >= 0) pr_.EdFloat(ent, f_.nextthink) = 0.0f;
    int fn = f_.think >= 0 ? pr_.EdInt(ent, f_.think) : 0;
    if (fn > 0) {
      pr_.GFloat(g_.time) = time_;
      pr_.GInt(g_.self) = ent;
      pr_.GInt(g_.other) = 0;
      pr_.Execute(fn);
    }
  }
}

// ------------------------------------------------------- player movement

bool GameHost::CheckWater(int ent) {
  float point[3];
  float* org = pr_.EdVector(ent, f_.origin);
  float* mins = pr_.EdVector(ent, f_.mins);
  point[0] = org[0];
  point[1] = org[1];
  point[2] = org[2] + mins[2] + 1.0f;
  int wl = 0, wt = CONTENTS_EMPTY;
  int cont = PointContents(point);
  if (cont <= CONTENTS_WATER) {
    wt = cont;
    wl = 1;
    point[2] = org[2] + (mins[2] + pr_.EdVector(ent, f_.maxs)[2]) * 0.5f;
    if (PointContents(point) <= CONTENTS_WATER) {
      wl = 2;
      point[2] = org[2] + (f_.view_ofs >= 0
                               ? pr_.EdVector(ent, f_.view_ofs)[2]
                               : 22.0f);
      if (PointContents(point) <= CONTENTS_WATER) wl = 3;
    }
  }
  if (f_.waterlevel >= 0) pr_.EdFloat(ent, f_.waterlevel) = (float)wl;
  if (f_.watertype >= 0) pr_.EdFloat(ent, f_.watertype) = (float)wt;
  return wl > 1;
}

void GameHost::WaterMove() {
  int ent = player_;
  float fwd[3], right[3], up[3];
  AngleVectors(pr_.EdVector(ent, f_.v_angle), fwd, right, up);
  float wishvel[3];
  for (int i = 0; i < 3; i++)
    wishvel[i] = fwd[i] * cmd_.forwardmove + right[i] * cmd_.sidemove;
  if (cmd_.forwardmove == 0 && cmd_.sidemove == 0 && cmd_.upmove == 0)
    wishvel[2] -= 60.0f;  // sink
  else
    wishvel[2] += cmd_.upmove;
  float wishspeed = Length(wishvel);
  float maxspeed = Cvar("sv_maxspeed");
  if (wishspeed > maxspeed) {
    Scale(wishvel, maxspeed / wishspeed, wishvel);
    wishspeed = maxspeed;
  }
  wishspeed *= 0.7f;
  // water friction
  float* vel = pr_.EdVector(ent, f_.velocity);
  float speed = Length(vel);
  float newspeed = 0.0f;
  if (speed > 0.0f) {
    newspeed = speed - frametime_ * speed * Cvar("sv_friction");
    if (newspeed < 0.0f) newspeed = 0.0f;
    Scale(vel, newspeed / speed, vel);
  }
  if (wishspeed <= 0.1f) return;
  float addspeed = wishspeed - newspeed;
  if (addspeed <= 0.0f) return;
  float wishdir[3];
  Copy(wishvel, wishdir);
  float l = Length(wishdir);
  if (l > 0.0f) Scale(wishdir, 1.0f / l, wishdir);
  float accelspeed = Cvar("sv_accelerate") * wishspeed * frametime_;
  if (accelspeed > addspeed) accelspeed = addspeed;
  for (int i = 0; i < 3; i++) vel[i] += accelspeed * wishdir[i];
}

void GameHost::ClientThink(float dt) {
  int ent = player_;
  frametime_ = dt;
  // punchangle decay
  if (f_.punchangle >= 0) {
    float* p = pr_.EdVector(ent, f_.punchangle);
    float len = Length(p);
    if (len > 0.0f) {
      float ns = len - 10.0f * dt;
      if (ns < 0.0f) ns = 0.0f;
      Scale(p, ns / len, p);
    }
  }
  if (f_.deadflag >= 0 && pr_.EdFloat(ent, f_.deadflag) > 0.0f) return;

  // view angles → entity angles
  if (f_.v_angle >= 0) Copy(cmd_.viewangles, pr_.EdVector(ent, f_.v_angle));
  float* angles = pr_.EdVector(ent, f_.angles);
  angles[0] = -cmd_.viewangles[0] / 3.0f;
  angles[1] = cmd_.viewangles[1];
  angles[2] = 0.0f;

  int flags = f_.flags >= 0 ? (int)pr_.EdFloat(ent, f_.flags) : 0;
  if (flags & FL_WATERJUMP) {
    // ride the waterjump: velocity was set by the QC/engine
    return;
  }
  int wl = f_.waterlevel >= 0 ? (int)pr_.EdFloat(ent, f_.waterlevel) : 0;
  int mt = (int)pr_.EdFloat(ent, f_.movetype);
  if (wl >= 2 && mt != MOVETYPE_NOCLIP) {
    WaterMove();
    return;
  }

  // air/ground move
  float va[3] = {0.0f, angles[1], 0.0f};  // wish dirs are yaw-only on ground
  if (mt == MOVETYPE_NOCLIP || mt == MOVETYPE_FLY)
    Copy(cmd_.viewangles, va);
  float fwd[3], right[3], up[3];
  AngleVectors(va, fwd, right, up);
  float wishvel[3];
  for (int i = 0; i < 3; i++)
    wishvel[i] = fwd[i] * cmd_.forwardmove + right[i] * cmd_.sidemove;
  if (mt == MOVETYPE_NOCLIP || mt == MOVETYPE_FLY)
    wishvel[2] += cmd_.upmove;
  else
    wishvel[2] = 0.0f;

  float wishspeed = Length(wishvel);
  float wishdir[3];
  Copy(wishvel, wishdir);
  if (wishspeed > 0.0f) Scale(wishdir, 1.0f / wishspeed, wishdir);
  float maxspeed = Cvar("sv_maxspeed");
  if (wishspeed > maxspeed) {
    Scale(wishvel, maxspeed / wishspeed, wishvel);
    wishspeed = maxspeed;
  }

  float* vel = pr_.EdVector(ent, f_.velocity);
  if (mt == MOVETYPE_NOCLIP) {
    Copy(wishvel, vel);
    return;
  }

  if (flags & FL_ONGROUND) {
    // friction
    float speed = std::sqrt(vel[0] * vel[0] + vel[1] * vel[1]);
    if (speed > 0.0f) {
      float stop = Cvar("sv_stopspeed");
      float control = speed < stop ? stop : speed;
      float newspeed = speed - dt * control * Cvar("sv_friction");
      if (newspeed < 0.0f) newspeed = 0.0f;
      float s = newspeed / speed;
      vel[0] *= s;
      vel[1] *= s;
    }
    // accelerate
    float currentspeed = Dot(vel, wishdir);
    float addspeed = wishspeed - currentspeed;
    if (addspeed > 0.0f) {
      float accelspeed = Cvar("sv_accelerate") * dt * wishspeed;
      if (accelspeed > addspeed) accelspeed = addspeed;
      for (int i = 0; i < 3; i++) vel[i] += accelspeed * wishdir[i];
    }
  } else {
    // air accelerate (capped wishspeed 30)
    float ws = wishspeed > 30.0f ? 30.0f : wishspeed;
    float currentspeed = Dot(vel, wishdir);
    float addspeed = ws - currentspeed;
    if (addspeed > 0.0f) {
      float accelspeed = Cvar("sv_accelerate") * wishspeed * dt;
      if (accelspeed > addspeed) accelspeed = addspeed;
      for (int i = 0; i < 3; i++) vel[i] += accelspeed * wishdir[i];
    }
  }
}

void GameHost::WalkMoveClient(float dt) {
  int ent = player_;
  int flags = f_.flags >= 0 ? (int)pr_.EdFloat(ent, f_.flags) : 0;
  bool oldonground = flags & FL_ONGROUND;
  if (f_.flags >= 0)
    pr_.EdFloat(ent, f_.flags) = (float)(flags & ~FL_ONGROUND);

  float oldorg[3], oldvel[3];
  Copy(pr_.EdVector(ent, f_.origin), oldorg);
  Copy(pr_.EdVector(ent, f_.velocity), oldvel);
  Trace steptrace;
  int clip = FlyMove(ent, dt, &steptrace);
  if (!(clip & 2)) return;  // move didn't block on a step
  int wl = f_.waterlevel >= 0 ? (int)pr_.EdFloat(ent, f_.waterlevel) : 0;
  if (!oldonground && wl == 0) return;  // airborne juke: no step-up
  if ((int)pr_.EdFloat(ent, f_.movetype) != MOVETYPE_WALK) return;
  if (Cvar("sv_nostep") > 0.0f) return;
  int fl2 = f_.flags >= 0 ? (int)pr_.EdFloat(ent, f_.flags) : 0;
  if (fl2 & FL_WATERJUMP) return;

  float nosteporg[3], nostepvel[3];
  Copy(pr_.EdVector(ent, f_.origin), nosteporg);
  Copy(pr_.EdVector(ent, f_.velocity), nostepvel);

  // try the move again from STEPSIZE higher
  Copy(oldorg, pr_.EdVector(ent, f_.origin));
  float upmove[3] = {0, 0, STEPSIZE};
  float downmove[3] = {0, 0, -STEPSIZE + oldvel[2] * dt};
  SVMovePush(ent, upmove);
  float* vel = pr_.EdVector(ent, f_.velocity);
  vel[0] = oldvel[0];
  vel[1] = oldvel[1];
  vel[2] = 0.0f;
  clip = FlyMove(ent, dt, &steptrace);
  Trace downtrace = SVMovePush(ent, downmove);
  if (downtrace.plane.normal[2] > 0.7f) {
    if ((int)pr_.EdFloat(ent, f_.movetype) == MOVETYPE_WALK) {
      int fl = f_.flags >= 0 ? (int)pr_.EdFloat(ent, f_.flags) : 0;
      if (f_.flags >= 0)
        pr_.EdFloat(ent, f_.flags) = (float)(fl | FL_ONGROUND);
      if (f_.groundentity >= 0 && downtrace.ent >= 0)
        pr_.EdInt(ent, f_.groundentity) = downtrace.ent;
    }
  } else {
    // the step-down landed on a steep plane: keep the unstepped move
    Copy(nosteporg, pr_.EdVector(ent, f_.origin));
    Copy(nostepvel, pr_.EdVector(ent, f_.velocity));
  }
}

void GameHost::PhysicsClient(float dt) {
  int ent = player_;
  int mt = (int)pr_.EdFloat(ent, f_.movetype);
  CheckWater(ent);
  if (getenv("MQ_PHYS_DEBUG")) {
    float* v = pr_.EdVector(ent, f_.velocity);
    fprintf(stderr, "physclient mt=%d v=(%g %g %g) flags=%d\n", mt, v[0],
            v[1], v[2], (int)pr_.EdFloat(ent, f_.flags));
  }
  switch (mt) {
    case MOVETYPE_NONE:
      RunThink(ent, dt);
      break;
    case MOVETYPE_WALK: {
      if (!RunThink(ent, dt)) return;
      int flags = f_.flags >= 0 ? (int)pr_.EdFloat(ent, f_.flags) : 0;
      int wl = f_.waterlevel >= 0 ? (int)pr_.EdFloat(ent, f_.waterlevel) : 0;
      if (!(flags & FL_ONGROUND) && !(flags & FL_WATERJUMP) && wl < 2)
        AddGravity(ent, dt);
      CheckVelocity(ent);
      WalkMoveClient(dt);
      break;
    }
    case MOVETYPE_TOSS:
    case MOVETYPE_BOUNCE:
      PhysicsToss(ent, dt);
      break;
    case MOVETYPE_FLY:
      if (!RunThink(ent, dt)) return;
      CheckVelocity(ent);
      FlyMove(ent, dt, nullptr);
      break;
    case MOVETYPE_NOCLIP:
      PhysicsNoclip(ent, dt);
      break;
    default:
      break;
  }
  LinkEdict(ent, true);
}

void GameHost::Physics(float dt) {
  // StartFrame (self = other = world)
  pr_.GInt(g_.self) = 0;
  if (g_.other >= 0) pr_.GInt(g_.other) = 0;
  pr_.GFloat(g_.time) = time_;
  if (g_.fn_StartFrame > 0) pr_.Execute(g_.fn_StartFrame);
  if (!pr_.ok()) return;

  for (int i = 0; i < pr_.NumEdicts(); i++) {
    Edict& e = pr_.Ed(i);
    if (e.free) continue;
    if (g_.force_retouch >= 0 && pr_.GFloat(g_.force_retouch) > 0.0f)
      LinkEdict(i, true);
    if (i == player_) {
      if (f_.button0 >= 0) pr_.EdFloat(i, f_.button0) = cmd_.button0;
      if (f_.button1 >= 0) pr_.EdFloat(i, f_.button1) = cmd_.button1;
      if (f_.button2 >= 0) pr_.EdFloat(i, f_.button2) = cmd_.button2;
      if (f_.impulse >= 0 && cmd_.impulse)
        pr_.EdFloat(i, f_.impulse) = (float)cmd_.impulse;
      if (g_.fn_PlayerPreThink > 0) CallFunction(g_.fn_PlayerPreThink, i);
      ClientThink(dt);
      PhysicsClient(dt);
      if (g_.fn_PlayerPostThink > 0) CallFunction(g_.fn_PlayerPostThink, i);
      cmd_.impulse = 0;
      continue;
    }
    switch ((int)pr_.EdFloat(i, f_.movetype)) {
      case MOVETYPE_PUSH:
        PhysicsPusher(i, dt);
        break;
      case MOVETYPE_NONE:
        RunThink(i, dt);
        break;
      case MOVETYPE_NOCLIP:
        PhysicsNoclip(i, dt);
        break;
      case MOVETYPE_STEP:
        PhysicsStep(i, dt);
        break;
      case MOVETYPE_TOSS:
      case MOVETYPE_BOUNCE:
      case MOVETYPE_FLY:
      case MOVETYPE_FLYMISSILE:
        PhysicsToss(i, dt);
        break;
      default:
        break;
    }
    if (!pr_.ok()) return;
  }
  if (g_.force_retouch >= 0 && pr_.GFloat(g_.force_retouch) > 0.0f)
    pr_.GFloat(g_.force_retouch) -= 1.0f;
  time_ += dt;
}

bool GameHost::Frame(float dt) {
  if (!loaded_) return false;
  if (dt > 0.1f) dt = 0.1f;
  frametime_ = dt;
  events_ = FrameEvents{};
  if (g_.frametime >= 0) pr_.GFloat(g_.frametime) = dt;
  pr_.GFloat(g_.time) = time_;
  Physics(dt);
  if (!pr_.ok()) {
    error_ = pr_.error();
    return false;
  }
  return true;
}

// ----------------------------------------------------------- extraction

int GameHost::SnapshotEntities(float* origins, float* angles,
                               int32_t* modelindex, int32_t* frames,
                               float* alphas, int32_t* edict_ids,
                               int max_out) {
  int n = 0;
  for (int i = 0; i < pr_.NumEdicts() && n < max_out; i++) {
    Edict& e = pr_.Ed(i);
    if (e.free) continue;
    int mi = f_.modelindex >= 0 ? (int)pr_.EdFloat(i, f_.modelindex) : 0;
    if (mi <= 0) continue;
    Copy(pr_.EdVector(i, f_.origin), origins + n * 3);
    Copy(pr_.EdVector(i, f_.angles), angles + n * 3);
    modelindex[n] = mi;
    frames[n] = f_.frame >= 0 ? (int)pr_.EdFloat(i, f_.frame) : 0;
    alphas[n] = 1.0f;
    edict_ids[n] = i;
    n++;
  }
  return n;
}

}  // namespace mqgame
