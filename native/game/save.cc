// Checkpoint / resume for the game host (host.h SaveState/RestoreState).
//
// The reference checkpoints game state through Quake's own savegame
// system (SURVEY.md §5, quakespasm Host_Savegame_f); this is the
// equivalent for the clean-room host: a versioned little-endian binary
// blob of every piece of dynamic state. Static tables (progs bytecode,
// defs, the string table, world hulls) are NOT saved — restore targets
// a host that has loaded the same progs.dat and world.
#include <cstring>

#include "host.h"

namespace mqgame {

namespace {

constexpr uint32_t kMagic = 0x4D515356u;  // "MQSV"
constexpr uint32_t kVersion = 1;

void PutRaw(std::string& out, const void* p, size_t n) {
  out.append(reinterpret_cast<const char*>(p), n);
}

template <typename T>
void Put(std::string& out, const T& v) {
  PutRaw(out, &v, sizeof(T));
}

void PutStr(std::string& out, const std::string& s) {
  Put<uint32_t>(out, (uint32_t)s.size());
  PutRaw(out, s.data(), s.size());
}

bool GetRaw(const char*& p, const char* end, void* dst, size_t n) {
  if ((size_t)(end - p) < n) return false;
  std::memcpy(dst, p, n);
  p += n;
  return true;
}

template <typename T>
bool Get(const char*& p, const char* end, T& v) {
  return GetRaw(p, end, &v, sizeof(T));
}

bool GetStr(const char*& p, const char* end, std::string& s) {
  uint32_t n;
  if (!Get(p, end, n)) return false;
  if ((size_t)(end - p) < n) return false;
  s.assign(p, n);
  p += n;
  return true;
}

}  // namespace

// ---------------- Progs ----------------

void Progs::SaveState(std::string& out) const {
  Put<uint32_t>(out, (uint32_t)globals_.size());
  PutRaw(out, globals_.data(), globals_.size() * sizeof(Cell));
  Put<uint32_t>(out, (uint32_t)dynstrings_.size());
  for (const auto& s : dynstrings_) PutStr(out, s);
  Put<int32_t>(out, entityfields_);
  Put<uint32_t>(out, (uint32_t)edicts_.size());
  for (const auto& e : edicts_) {
    Put<uint8_t>(out, e.free ? 1 : 0);
    Put<float>(out, e.freetime);
    PutRaw(out, e.v.data(), e.v.size() * sizeof(Cell));
  }
}

bool Progs::RestoreState(const char*& p, const char* end) {
  uint32_t nglob;
  if (!Get(p, end, nglob)) return false;
  if (nglob != globals_.size()) return false;  // different progs image
  if (!GetRaw(p, end, globals_.data(), nglob * sizeof(Cell))) return false;
  uint32_t ndyn;
  if (!Get(p, end, ndyn)) return false;
  dynstrings_.resize(ndyn);
  for (auto& s : dynstrings_)
    if (!GetStr(p, end, s)) return false;
  int32_t ef;
  if (!Get(p, end, ef)) return false;
  if (ef != entityfields_) return false;
  uint32_t ned;
  if (!Get(p, end, ned)) return false;
  edicts_.resize(ned);
  for (auto& e : edicts_) {
    uint8_t fr;
    if (!Get(p, end, fr)) return false;
    e.free = fr != 0;
    if (!Get(p, end, e.freetime)) return false;
    e.v.resize(entityfields_);
    if (!GetRaw(p, end, e.v.data(), e.v.size() * sizeof(Cell))) return false;
  }
  callstack_.clear();
  localstack_.clear();
  return true;
}

// ---------------- GameHost ----------------

std::string GameHost::SaveState() const {
  std::string out;
  Put(out, kMagic);
  Put(out, kVersion);
  Put(out, time_);
  Put(out, frametime_);
  Put<int32_t>(out, player_);
  Put(out, rng_state_);
  PutStr(out, changelevel_);
  for (const auto& ls : lightstyles_) PutStr(out, ls);
  Put<uint32_t>(out, (uint32_t)model_names_.size());
  for (const auto& s : model_names_) PutStr(out, s);
  Put<uint32_t>(out, (uint32_t)sound_names_.size());
  for (const auto& s : sound_names_) PutStr(out, s);
  Put<uint32_t>(out, (uint32_t)statics_.size());
  for (const auto& st : statics_) PutRaw(out, &st, sizeof(StaticEnt));
  Put<uint32_t>(out, (uint32_t)ambient_sounds_.size());
  for (const auto& snd : ambient_sounds_) {
    Put<int32_t>(out, snd.ent);
    Put<int32_t>(out, snd.channel);
    PutStr(out, snd.sample);
    Put(out, snd.volume);
    Put(out, snd.attenuation);
    PutRaw(out, snd.origin, sizeof(snd.origin));
  }
  Put<uint32_t>(out, (uint32_t)cvars_.size());
  for (const auto& [k, v] : cvars_) {
    PutStr(out, k);
    Put(out, v);
  }
  pr_.SaveState(out);
  return out;
}

bool GameHost::RestoreState(const uint8_t* data, size_t len) {
  const char* p = reinterpret_cast<const char*>(data);
  const char* end = p + len;
  uint32_t magic, version;
  if (!Get(p, end, magic) || magic != kMagic) {
    error_ = "restore: bad magic";
    return false;
  }
  if (!Get(p, end, version) || version != kVersion) {
    error_ = "restore: unsupported version";
    return false;
  }
  if (!loaded_) {
    error_ = "restore: load progs + world first";
    return false;
  }
  bool ok = Get(p, end, time_) && Get(p, end, frametime_);
  int32_t player;
  ok = ok && Get(p, end, player);
  player_ = player;
  ok = ok && Get(p, end, rng_state_) && GetStr(p, end, changelevel_);
  for (auto& ls : lightstyles_) ok = ok && GetStr(p, end, ls);
  uint32_t n;
  ok = ok && Get(p, end, n);
  if (ok) {
    model_names_.resize(n);
    for (auto& s : model_names_) ok = ok && GetStr(p, end, s);
  }
  ok = ok && Get(p, end, n);
  if (ok) {
    sound_names_.resize(n);
    for (auto& s : sound_names_) ok = ok && GetStr(p, end, s);
  }
  ok = ok && Get(p, end, n);
  if (ok) {
    statics_.resize(n);
    for (auto& st : statics_) ok = ok && GetRaw(p, end, &st, sizeof(StaticEnt));
  }
  ok = ok && Get(p, end, n);
  if (ok) {
    ambient_sounds_.resize(n);
    for (auto& snd : ambient_sounds_) {
      int32_t ent, channel;
      ok = ok && Get(p, end, ent) && Get(p, end, channel) &&
           GetStr(p, end, snd.sample) && Get(p, end, snd.volume) &&
           Get(p, end, snd.attenuation) &&
           GetRaw(p, end, snd.origin, sizeof(snd.origin));
      snd.ent = ent;
      snd.channel = channel;
    }
  }
  ok = ok && Get(p, end, n);
  if (ok) {
    cvars_.clear();
    for (uint32_t i = 0; i < n; ++i) {
      std::string k;
      float v;
      ok = ok && GetStr(p, end, k) && Get(p, end, v);
      if (ok) cvars_[k] = v;
    }
  }
  if (!ok || !pr_.RestoreState(p, end)) {
    error_ = "restore: truncated or mismatched state";
    return false;
  }
  // relink every live entity into the collision world (links are
  // rebuilt, not serialized)
  for (int e = 1; e < pr_.NumEdicts(); ++e) {
    if (!pr_.Ed(e).free) LinkEdict(e, false);
  }
  events_ = FrameEvents{};
  return true;
}

}  // namespace mqgame
