// QuakeC progs.dat virtual machine.
//
// The reference embeds quakespasm, whose server runs the game logic
// compiled into progs.dat bytecode (SURVEY.md §2.5: Host_Init/Host_Frame
// drive "entity simulation, physics, demo playback, server"; use sites
// at quake_node.cpp:39-76). This is a clean-room VM for that bytecode
// format (public: progs version 6, id Software 1996): statements are
// (op, a, b, c) quadruples over a flat global table, entities are blocks
// of `entityfields` 32-bit cells, and builtins dispatch to the engine.
//
// Engine-side integration (collision, physics, spawning) lives in
// host.cc; this file is only the bytecode machine.
#pragma once

#include <cstdint>
#include <functional>
#include <string>
#include <unordered_map>
#include <vector>

namespace mqgame {

// ---- progs.dat file layout (version 6) ----
struct DStatement {
  uint16_t op;
  int16_t a, b, c;
};

struct DDef {
  uint16_t type;  // ev_*; high bit 0x8000 = saveglobal
  uint16_t ofs;
  int32_t s_name;
};

struct DFunction {
  int32_t first_statement;  // negative = -builtin number
  int32_t parm_start;
  int32_t locals;
  int32_t profile;
  int32_t s_name;
  int32_t s_file;
  int32_t numparms;
  uint8_t parm_size[8];
};

enum EvType {
  ev_void = 0,
  ev_string,
  ev_float,
  ev_vector,
  ev_entity,
  ev_field,
  ev_function,
  ev_pointer,
};

// globals ABI (fixed offsets, progs v6)
enum {
  OFS_NULL = 0,
  OFS_RETURN = 1,
  OFS_PARM0 = 4,  // 3 cells per parm
  OFS_PARM1 = 7,
  OFS_PARM2 = 10,
  OFS_PARM3 = 13,
  OFS_PARM4 = 16,
  OFS_PARM5 = 19,
  OFS_PARM6 = 22,
  OFS_PARM7 = 25,
  RESERVED_OFS = 28,
};

union Cell {
  float f;
  int32_t i;
};

class Progs;
using Builtin = std::function<void(Progs&)>;

// One entity: `entityfields` cells + lifecycle bookkeeping. Entity
// references in QC globals are stored as the edict INDEX (world = 0);
// field pointers (OP_ADDRESS/OP_STOREP_*) encode index * entityfields
// + field offset. (We need no binary savegame compatibility, so the
// classic byte-offset encoding is not kept.)
struct Edict {
  bool free = false;
  float freetime = 0.0f;  // sv.time when freed (reuse guard)
  std::vector<Cell> v;
};

class Progs {
 public:
  // Parses the progs.dat image. Returns false (and sets error()) on a
  // malformed or unsupported image.
  bool Load(const uint8_t* data, size_t len);

  // ---- strings ----
  // QC string refs: >= 0 index into the loaded string table;
  // < 0 engine-allocated dynamic string (-1 - idx).
  const char* Str(int32_t ref) const;
  int32_t NewString(const std::string& s);

  // ---- globals / defs ----
  Cell* Globals() { return globals_.data(); }
  float& GFloat(int ofs) { return globals_[ofs].f; }
  int32_t& GInt(int ofs) { return globals_[ofs].i; }
  float* GVector(int ofs) { return &globals_[ofs].f; }
  // Resolve a global/field def by name; returns -1 if absent.
  int GlobalOfs(const std::string& name) const;
  int FieldOfs(const std::string& name) const;
  uint16_t FieldType(const std::string& name) const;
  int FunctionIndex(const std::string& name) const;
  const DFunction& Function(int idx) const { return functions_[idx]; }
  int NumFunctions() const { return (int)functions_.size(); }
  const std::string& FunctionName(int idx) const { return fn_names_[idx]; }

  // ---- edicts ----
  int entityfields() const { return entityfields_; }
  Edict& Ed(int idx) { return edicts_[idx]; }
  const Edict& Ed(int idx) const { return edicts_[idx]; }
  int NumEdicts() const { return (int)edicts_.size(); }
  int AllocEdict(float time);
  void FreeEdict(int idx, float time);
  float& EdFloat(int e, int fofs) { return edicts_[e].v[fofs].f; }
  int32_t& EdInt(int e, int fofs) { return edicts_[e].v[fofs].i; }
  float* EdVector(int e, int fofs) { return &edicts_[e].v[fofs].f; }

  // ---- execution ----
  void SetBuiltin(int num, Builtin fn) { builtins_[num] = std::move(fn); }
  // Execute a QC function to completion. Builtin calls dispatch through
  // the registry; unknown builtins raise a runtime error.
  void Execute(int fnum);
  bool ok() const { return error_.empty(); }
  const std::string& error() const { return error_; }
  void RuntimeError(const std::string& msg);

  // Convenience for engine→QC calls.
  void SetParmFloat(int n, float v) { GFloat(OFS_PARM0 + 3 * n) = v; }
  void SetParmVector(int n, const float* v) {
    float* p = GVector(OFS_PARM0 + 3 * n);
    p[0] = v[0], p[1] = v[1], p[2] = v[2];
  }
  void SetParmInt(int n, int32_t v) { GInt(OFS_PARM0 + 3 * n) = v; }
  float ParmFloat(int n) { return GFloat(OFS_PARM0 + 3 * n); }
  float* ParmVector(int n) { return GVector(OFS_PARM0 + 3 * n); }
  int32_t ParmInt(int n) { return GInt(OFS_PARM0 + 3 * n); }
  const char* ParmStr(int n) { return Str(ParmInt(n)); }
  void ReturnFloat(float v) { GFloat(OFS_RETURN) = v; }
  void ReturnVector(const float* v) {
    float* p = GVector(OFS_RETURN);
    p[0] = v[0], p[1] = v[1], p[2] = v[2];
  }
  void ReturnInt(int32_t v) { GInt(OFS_RETURN) = v; }
  int argc() const { return argc_; }

  // Zero + grow the edict pool (world + headroom), done once after load.
  void InitEdicts(int max_edicts);

  // ---- checkpoint / resume: dynamic VM state only (globals, edicts,
  // dynamic strings). Static tables (statements, defs, strings_) come
  // from the progs.dat image and must already be loaded on restore.
  void SaveState(std::string& out) const;
  bool RestoreState(const char*& p, const char* end);

 private:
  int RunFunction(int fnum);  // returns -1; appends to error_ on fault

  std::vector<DStatement> statements_;
  std::vector<DDef> globaldefs_;
  std::vector<DDef> fielddefs_;
  std::vector<DFunction> functions_;
  std::vector<char> strings_;
  std::vector<Cell> globals_;
  std::vector<std::string> dynstrings_;
  std::vector<std::string> fn_names_;
  std::unordered_map<std::string, int> fn_by_name_;
  std::unordered_map<std::string, DDef> global_by_name_;
  std::unordered_map<std::string, DDef> field_by_name_;
  std::unordered_map<int, Builtin> builtins_;
  std::vector<Edict> edicts_;
  int entityfields_ = 0;
  int num_globals_real_ = 0;
  int argc_ = 0;
  std::string error_;

  struct StackFrame {
    int ret_statement;
    int fnum;
  };
  std::vector<StackFrame> callstack_;
  std::vector<Cell> localstack_;
  int current_fn_ = -1;
};

}  // namespace mqgame
