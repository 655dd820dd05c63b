// extern "C" surface of the game host, consumed via ctypes from
// merian_quake_tpu/game/host.py (the same seam style as the reference's
// extern "C" quakespasm hooks, quake_node.cpp:80-229).
#include <cstring>
#include <string>

#include "host.h"

using mqgame::GameHost;
using mqgame::UserCmd;

extern "C" {

void* mq_game_create() { return new GameHost(); }
void mq_game_destroy(void* h) { delete (GameHost*)h; }

int mq_game_load_progs(void* h, const uint8_t* data, long long len,
                       int max_edicts) {
  return ((GameHost*)h)->LoadProgs(data, (size_t)len, max_edicts) ? 1 : 0;
}

void mq_game_load_world(void* h, const float* planes, int nplanes,
                        const int32_t* clipnodes, int nclipnodes,
                        const int32_t* headnodes, const float* bounds,
                        int nmodels) {
  ((GameHost*)h)->LoadWorldHulls(planes, nplanes, clipnodes, nclipnodes,
                                 headnodes, bounds, nmodels);
}

void mq_game_set_model_bounds(void* h, const char* name, const float* mins,
                              const float* maxs) {
  ((GameHost*)h)->SetModelBounds(name, mins, maxs);
}

void mq_game_set_cvar(void* h, const char* name, float v) {
  ((GameHost*)h)->SetCvar(name, v);
}

float mq_game_cvar(void* h, const char* name) {
  return ((GameHost*)h)->Cvar(name);
}

int mq_game_spawn_server(void* h, const char* lump, const char* mapname) {
  return ((GameHost*)h)->SpawnServer(lump, mapname) ? 1 : 0;
}

int mq_game_spawn_client(void* h) {
  return ((GameHost*)h)->SpawnClient() ? 1 : 0;
}

void mq_game_set_usercmd(void* h, float fwd, float side, float up,
                         float pitch, float yaw, float roll, int buttons,
                         int impulse) {
  UserCmd c;
  c.forwardmove = fwd;
  c.sidemove = side;
  c.upmove = up;
  c.viewangles[0] = pitch;
  c.viewangles[1] = yaw;
  c.viewangles[2] = roll;
  c.button0 = buttons & 1;
  c.button1 = buttons & 2;
  c.button2 = buttons & 4;
  c.impulse = impulse;
  ((GameHost*)h)->SetUserCmd(c);
}

int mq_game_frame(void* h, float dt) {
  return ((GameHost*)h)->Frame(dt) ? 1 : 0;
}

float mq_game_time(void* h) { return ((GameHost*)h)->time(); }
int mq_game_player(void* h) { return ((GameHost*)h)->player(); }

const char* mq_game_error(void* h) {
  static thread_local std::string err;
  err = ((GameHost*)h)->error();
  return err.c_str();
}

int mq_game_snapshot(void* h, float* origins, float* angles,
                     int32_t* modelindex, int32_t* frames, float* alphas,
                     int32_t* edict_ids, int max_out) {
  return ((GameHost*)h)->SnapshotEntities(origins, angles, modelindex, frames,
                                          alphas, edict_ids, max_out);
}

int mq_game_num_statics(void* h) {
  return (int)((GameHost*)h)->statics().size();
}

void mq_game_get_statics(void* h, float* origins, float* angles,
                         int32_t* modelindex, int32_t* frames) {
  const auto& s = ((GameHost*)h)->statics();
  for (size_t i = 0; i < s.size(); i++) {
    std::memcpy(origins + i * 3, s[i].origin, 3 * sizeof(float));
    std::memcpy(angles + i * 3, s[i].angles, 3 * sizeof(float));
    modelindex[i] = s[i].modelindex;
    frames[i] = s[i].frame;
  }
}

int mq_game_num_models(void* h) {
  return (int)((GameHost*)h)->model_names().size();
}
const char* mq_game_model_name(void* h, int i) {
  const auto& names = ((GameHost*)h)->model_names();
  return (i >= 0 && i < (int)names.size()) ? names[i].c_str() : "";
}
int mq_game_num_sounds_precached(void* h) {
  return (int)((GameHost*)h)->sound_names().size();
}
const char* mq_game_sound_name(void* h, int i) {
  const auto& names = ((GameHost*)h)->sound_names();
  return (i >= 0 && i < (int)names.size()) ? names[i].c_str() : "";
}
const char* mq_game_lightstyle(void* h, int i) {
  return ((GameHost*)h)->lightstyle(i & 63).c_str();
}

int mq_game_num_prints(void* h) {
  return (int)((GameHost*)h)->events().prints.size();
}
const char* mq_game_print(void* h, int i) {
  const auto& p = ((GameHost*)h)->events().prints;
  return (i >= 0 && i < (int)p.size()) ? p[i].c_str() : "";
}
int mq_game_num_centerprints(void* h) {
  return (int)((GameHost*)h)->events().centerprints.size();
}
const char* mq_game_centerprint(void* h, int i) {
  const auto& p = ((GameHost*)h)->events().centerprints;
  return (i >= 0 && i < (int)p.size()) ? p[i].c_str() : "";
}

int mq_game_num_sounds(void* h) {
  return (int)((GameHost*)h)->events().sounds.size();
}
const char* mq_game_sound_sample(void* h, int i) {
  const auto& s = ((GameHost*)h)->events().sounds;
  return (i >= 0 && i < (int)s.size()) ? s[i].sample.c_str() : "";
}
// full sound-event record (the SNDDMA_* seam for the audio mixer:
// spatialization needs origin/volume/attenuation, channel override
// semantics need ent+channel)
void mq_game_get_sounds(void* h, int32_t* ent, int32_t* chan, float* origin,
                        float* vol, float* atten) {
  const auto& s = ((GameHost*)h)->events().sounds;
  for (size_t i = 0; i < s.size(); i++) {
    ent[i] = s[i].ent;
    chan[i] = s[i].channel;
    std::memcpy(origin + i * 3, s[i].origin, 3 * sizeof(float));
    vol[i] = s[i].volume;
    atten[i] = s[i].attenuation;
  }
}
const char* mq_game_changelevel(void* h) {
  return ((GameHost*)h)->changelevel().c_str();
}
int mq_game_num_ambient_sounds(void* h) {
  return (int)((GameHost*)h)->ambient_sounds().size();
}
const char* mq_game_ambient_sample(void* h, int i) {
  const auto& s = ((GameHost*)h)->ambient_sounds();
  return (i >= 0 && i < (int)s.size()) ? s[i].sample.c_str() : "";
}
void mq_game_get_ambient_sounds(void* h, float* origin, float* vol,
                                float* atten) {
  const auto& s = ((GameHost*)h)->ambient_sounds();
  for (size_t i = 0; i < s.size(); i++) {
    std::memcpy(origin + i * 3, s[i].origin, 3 * sizeof(float));
    vol[i] = s[i].volume;
    atten[i] = s[i].attenuation;
  }
}

int mq_game_num_particles(void* h) {
  return (int)((GameHost*)h)->events().particles.size();
}
void mq_game_get_particles(void* h, float* org, float* dir, float* color,
                           float* count) {
  const auto& ps = ((GameHost*)h)->events().particles;
  for (size_t i = 0; i < ps.size(); i++) {
    std::memcpy(org + i * 3, ps[i].org, 3 * sizeof(float));
    std::memcpy(dir + i * 3, ps[i].dir, 3 * sizeof(float));
    color[i] = ps[i].color;
    count[i] = ps[i].count;
  }
}

int mq_game_num_edicts(void* h) { return ((GameHost*)h)->progs().NumEdicts(); }
int mq_game_edict_free(void* h, int e) {
  return ((GameHost*)h)->progs().Ed(e).free ? 1 : 0;
}

// field / global peek-poke (tests + HUD extraction)
float mq_game_get_field(void* h, int ent, const char* name, int comp) {
  auto& pr = ((GameHost*)h)->progs();
  int ofs = pr.FieldOfs(name);
  if (ofs < 0) return 0.0f;
  return pr.EdFloat(ent, ofs + comp);
}
int mq_game_get_field_int(void* h, int ent, const char* name) {
  auto& pr = ((GameHost*)h)->progs();
  int ofs = pr.FieldOfs(name);
  if (ofs < 0) return 0;
  return pr.EdInt(ent, ofs);
}
const char* mq_game_get_field_str(void* h, int ent, const char* name) {
  auto& pr = ((GameHost*)h)->progs();
  int ofs = pr.FieldOfs(name);
  if (ofs < 0) return "";
  return pr.Str(pr.EdInt(ent, ofs));
}
void mq_game_set_field(void* h, int ent, const char* name, int comp,
                       float v) {
  auto& pr = ((GameHost*)h)->progs();
  int ofs = pr.FieldOfs(name);
  if (ofs >= 0) pr.EdFloat(ent, ofs + comp) = v;
}
void mq_game_set_field_int(void* h, int ent, const char* name, int v) {
  auto& pr = ((GameHost*)h)->progs();
  int ofs = pr.FieldOfs(name);
  if (ofs >= 0) pr.EdInt(ent, ofs) = v;
}
float mq_game_get_global(void* h, const char* name, int comp) {
  auto& pr = ((GameHost*)h)->progs();
  int ofs = pr.GlobalOfs(name);
  if (ofs < 0) return 0.0f;
  return pr.GFloat(ofs + comp);
}

// box trace (tests + dynamic-light/visibility probes): fills
// out[0]=fraction, out[1..3]=endpos, out[4..6]=plane normal,
// out[7]=allsolid, out[8]=startsolid, out[9]=ent
void mq_game_trace(void* h, const float* start, const float* mins,
                   const float* maxs, const float* end, int type,
                   int passedict, float* out) {
  mqgame::Trace t =
      ((GameHost*)h)->TracePublic(start, mins, maxs, end, type, passedict);
  out[0] = t.fraction;
  std::memcpy(out + 1, t.endpos, 3 * sizeof(float));
  std::memcpy(out + 4, t.plane.normal, 3 * sizeof(float));
  out[7] = t.allsolid ? 1.0f : 0.0f;
  out[8] = t.startsolid ? 1.0f : 0.0f;
  out[9] = (float)t.ent;
}

// ---- checkpoint / resume (host.h SaveState/RestoreState) ----
// Two-call protocol: size query (buf = null), then fill.
long long mq_game_save(void* h, uint8_t* buf, long long cap) {
  std::string s = ((GameHost*)h)->SaveState();
  if (buf && cap >= (long long)s.size())
    std::memcpy(buf, s.data(), s.size());
  return (long long)s.size();
}

int mq_game_restore(void* h, const uint8_t* buf, long long len) {
  return ((GameHost*)h)->RestoreState(buf, (size_t)len) ? 1 : 0;
}

// run a named QC function with self = ent (tests / console-command hooks)
int mq_game_execute(void* h, const char* fnname, int self_ent) {
  auto& pr = ((GameHost*)h)->progs();
  int fn = pr.FunctionIndex(fnname);
  if (fn < 0) return 0;
  int self_ofs = pr.GlobalOfs("self");
  if (self_ofs >= 0) pr.GInt(self_ofs) = self_ent;
  int time_ofs = pr.GlobalOfs("time");
  if (time_ofs >= 0) pr.GFloat(time_ofs) = ((GameHost*)h)->time();
  pr.Execute(fn);
  return pr.ok() ? 1 : 0;
}

}  // extern "C"
