// Game host: the quakespasm-equivalent simulation loop.
//
// Provides what the reference gets from embedding quakespasm
// (SURVEY.md §2.5): Host_Init ≈ LoadProgs+SpawnServer, Host_Frame ≈
// Frame (client think → server physics → QC think dispatch), and the
// extraction seam QuakeNode reads each frame (entity origins/angles/
// frames, player view, lightstyles, particles, prints; cf.
// quake_node.cpp:80-229,713-824). Collision is world.h hulls; game
// logic runs in the progs.h VM; everything here is the engine glue
// between them (spawning, movetypes, builtins).
#pragma once

#include <array>
#include <cstdint>
#include <map>
#include <string>
#include <vector>

#include "progs.h"
#include "world.h"

namespace mqgame {

// entvars the engine itself reads/writes, resolved by NAME from the
// progs fielddefs (robust to mods like Arcane Dimensions that extend
// the entvars block).
struct FieldOfs {
  int modelindex, absmin, absmax, ltime, movetype, solid, origin, oldorigin,
      velocity, angles, avelocity, punchangle, classname, model, frame, skin,
      effects, mins, maxs, size, touch, use, think, blocked, nextthink,
      groundentity, health, flags, waterlevel, watertype, teleport_time,
      ideal_yaw, yaw_speed, goalentity, enemy, spawnflags, target, targetname,
      owner, movedir, message, view_ofs, button0, button1, button2, impulse,
      fixangle, v_angle, idealpitch, netname, aiment, chain, deadflag,
      takedamage, items, armorvalue, currentammo, weaponframe, weaponmodel,
      weapon, armortype, max_health, frags, colormap, team, sounds, dmg_take,
      dmg_save, dmg_inflictor, noise, noise1, noise2, noise3;
};

struct GlobalOfsTable {
  int self, other, world, time, frametime, force_retouch, mapname, deathmatch,
      coop, teamplay, serverflags, total_secrets, total_monsters,
      found_secrets, killed_monsters, parm1, intermission_running,
      intermission_exittime, v_forward, v_up, v_right, trace_allsolid,
      trace_startsolid, trace_fraction, trace_endpos, trace_plane_normal,
      trace_plane_dist, trace_ent, trace_inopen, trace_inwater, msg_entity;
  int fn_main, fn_StartFrame, fn_PlayerPreThink, fn_PlayerPostThink,
      fn_ClientConnect, fn_PutClientInServer, fn_ClientDisconnect,
      fn_SetNewParms;
};

// movetypes / solids / flags (game ABI constants)
enum {
  MOVETYPE_NONE = 0,
  MOVETYPE_WALK = 3,
  MOVETYPE_STEP = 4,
  MOVETYPE_FLY = 5,
  MOVETYPE_TOSS = 6,
  MOVETYPE_PUSH = 7,
  MOVETYPE_NOCLIP = 8,
  MOVETYPE_FLYMISSILE = 9,
  MOVETYPE_BOUNCE = 10,
};
enum {
  SOLID_NOT = 0,
  SOLID_TRIGGER = 1,
  SOLID_BBOX = 2,
  SOLID_SLIDEBOX = 3,
  SOLID_BSP = 4,
};
enum {
  FL_FLY = 1,
  FL_SWIM = 2,
  FL_CLIENT = 8,
  FL_INWATER = 16,
  FL_MONSTER = 32,
  FL_ITEM = 256,
  FL_ONGROUND = 512,
  FL_PARTIALGROUND = 1024,
  FL_WATERJUMP = 2048,
  FL_JUMPRELEASED = 4096,
};

struct UserCmd {
  float forwardmove = 0, sidemove = 0, upmove = 0;
  float viewangles[3] = {0, 0, 0};  // pitch yaw roll
  bool button0 = false, button1 = false, button2 = false;
  int impulse = 0;
};

// per-frame event capture (the engine→renderer/audio seam)
struct FrameEvents {
  struct Sound {
    int ent, channel;
    std::string sample;
    float volume, attenuation;
    float origin[3];
  };
  struct ParticleEvent {
    float org[3], dir[3];
    float color, count;
  };
  std::vector<Sound> sounds;
  std::vector<ParticleEvent> particles;
  std::vector<std::string> prints;        // bprint/sprint
  std::vector<std::string> centerprints;  // centerprint
};

class GameHost {
 public:
  bool LoadProgs(const uint8_t* data, size_t len, int max_edicts = 1024);
  void LoadWorldHulls(const float* planes, int nplanes,
                      const int32_t* clipnodes, int nclipnodes,
                      const int32_t* headnodes, const float* bounds,
                      int nmodels);
  // Pre-register model bounds by name (alias/sprite models, so setmodel
  // can set sizes without loading files here).
  void SetModelBounds(const std::string& name, const float* mins,
                      const float* maxs);
  // Parse the entity lump and run all spawn functions (ED_LoadFromFile).
  bool SpawnServer(const std::string& entity_lump,
                   const std::string& mapname);
  // Connect the single local client into edict 1 (ClientConnect +
  // PutClientInServer).
  bool SpawnClient();

  void SetUserCmd(const UserCmd& cmd) { cmd_ = cmd; }
  bool Frame(float dt);  // Host_Frame: client think, physics, thinks

  // ---- extraction ----
  Progs& progs() { return pr_; }
  const FieldOfs& F() const { return f_; }
  float time() const { return time_; }
  int player() const { return player_; }
  const FrameEvents& events() const { return events_; }
  const std::vector<std::string>& model_names() const { return model_names_; }
  const std::vector<std::string>& sound_names() const { return sound_names_; }
  const std::string& lightstyle(int i) const { return lightstyles_[i]; }
  const std::string& error() const {
    return error_.empty() ? pr_.error() : error_;
  }
  void SetCvar(const std::string& name, float v) { cvars_[name] = v; }
  float Cvar(const std::string& name) const;

  // trace visible entities into flat arrays; returns count
  int SnapshotEntities(float* origins, float* angles, int32_t* modelindex,
                       int32_t* frames, float* alphas, int32_t* edict_ids,
                       int max_out);

  // static entities committed by the makestatic builtin (torches etc.)
  struct StaticEnt {
    float origin[3], angles[3];
    int modelindex, frame, skin;
  };
  const std::vector<StaticEnt>& statics() const { return statics_; }
  const std::vector<FrameEvents::Sound>& ambient_sounds() const {
    return ambient_sounds_;
  }
  const std::string& changelevel() const { return changelevel_; }

  // ---- checkpoint / resume (SURVEY.md §5: the reference checkpoints
  // game state via Quake's own save system; this is the equivalent
  // seam for the clean-room host). Serializes every piece of DYNAMIC
  // state — VM globals/edicts/dynamic strings, server time, player,
  // lightstyles, precache name lists, statics, ambient sounds, cvars,
  // RNG — into a versioned binary blob. Restore requires a host with
  // the SAME progs.dat and world loaded (static tables are not saved).
  std::string SaveState() const;
  bool RestoreState(const uint8_t* data, size_t len);

  bool MoveStepPublic(int ent, const float* move, bool relink);
  Trace TracePublic(const float* start, const float* mins, const float* maxs,
                    const float* end, int type, int passedict) {
    return SVMove(start, mins, maxs, end, type, passedict);
  }

 private:
  // ---- world interaction ----
  Trace SVMove(const float* start, const float* mins, const float* maxs,
               const float* end, int type, int passedict);
  Trace ClipMoveToEntity(int ent, const float* start, const float* mins,
                         const float* maxs, const float* end);
  Trace SVMovePush(int ent, const float* push);
  int PointContents(const float* p);
  bool TestEntityPosition(int ent);
  void LinkEdict(int ent, bool touch_triggers);
  void TouchTriggers(int ent);

  // ---- physics ----
  void Physics(float dt);
  bool RunThink(int ent, float dt);
  void PhysicsClient(float dt);
  void PhysicsPusher(int ent, float dt);
  void PhysicsStep(int ent, float dt);
  void PhysicsToss(int ent, float dt);
  void PhysicsNoclip(int ent, float dt);
  void AddGravity(int ent, float dt);
  void CheckVelocity(int ent);
  int FlyMove(int ent, float dt, Trace* steptrace);
  void WalkMoveClient(float dt);
  void ClientThink(float dt);
  void WaterMove();
  bool CheckWater(int ent);
  void Impact(int e1, int e2);
  bool PushMove(int pusher, float dt);
  bool MoveStep(int ent, const float* move, bool relink);
  bool CheckBottom(int ent);
  void NewChaseDir(int actor, int goal, float dist);
  void SetMinMaxSize(int ent, const float* mins, const float* maxs);

  // ---- spawning ----
  int ParseEdict(const char*& s, int ent);
  void CallSpawn(int ent);
  void RegisterBuiltins();
  void CallFunction(int fn, int self_ent);

  Progs pr_;
  CollisionWorld world_;
  FieldOfs f_;
  GlobalOfsTable g_;
  UserCmd cmd_;
  FrameEvents events_;
  std::map<std::string, float> cvars_;
  std::vector<std::string> model_names_;   // precache order (1-based QC)
  std::vector<std::string> sound_names_;
  std::map<std::string, std::array<float, 6>> model_bounds_;
  std::array<std::string, 64> lightstyles_;
  std::vector<StaticEnt> statics_;
  std::vector<FrameEvents::Sound> ambient_sounds_;
  std::string changelevel_;
  uint32_t rng_state_ = 0x1337u;
  std::string error_;
  float time_ = 1.0f;  // servertime starts at 1.0 (spawn guard classic)
  float frametime_ = 0.0f;
  int player_ = 0;
  bool loaded_ = false;

  friend class HostTestPeer;
};

}  // namespace mqgame
