// QuakeC bytecode VM — see progs.h.
#include "progs.h"

#include <cmath>
#include <cstring>

namespace mqgame {

namespace {

// progs v6 opcodes, in file order.
enum Op {
  OP_DONE = 0,
  OP_MUL_F,
  OP_MUL_V,
  OP_MUL_FV,
  OP_MUL_VF,
  OP_DIV_F,
  OP_ADD_F,
  OP_ADD_V,
  OP_SUB_F,
  OP_SUB_V,
  OP_EQ_F,
  OP_EQ_V,
  OP_EQ_S,
  OP_EQ_E,
  OP_EQ_FNC,
  OP_NE_F,
  OP_NE_V,
  OP_NE_S,
  OP_NE_E,
  OP_NE_FNC,
  OP_LE,
  OP_GE,
  OP_LT,
  OP_GT,
  OP_LOAD_F,
  OP_LOAD_V,
  OP_LOAD_S,
  OP_LOAD_ENT,
  OP_LOAD_FLD,
  OP_LOAD_FNC,
  OP_ADDRESS,
  OP_STORE_F,
  OP_STORE_V,
  OP_STORE_S,
  OP_STORE_ENT,
  OP_STORE_FLD,
  OP_STORE_FNC,
  OP_STOREP_F,
  OP_STOREP_V,
  OP_STOREP_S,
  OP_STOREP_ENT,
  OP_STOREP_FLD,
  OP_STOREP_FNC,
  OP_RETURN,
  OP_NOT_F,
  OP_NOT_V,
  OP_NOT_S,
  OP_NOT_ENT,
  OP_NOT_FNC,
  OP_IF,
  OP_IFNOT,
  OP_CALL0,
  OP_CALL1,
  OP_CALL2,
  OP_CALL3,
  OP_CALL4,
  OP_CALL5,
  OP_CALL6,
  OP_CALL7,
  OP_CALL8,
  OP_STATE,
  OP_GOTO,
  OP_AND,
  OP_OR,
  OP_BITAND,
  OP_BITOR,
  NUM_OPS,
};

struct Header {
  int32_t version;
  int32_t crc;
  int32_t ofs_statements, num_statements;
  int32_t ofs_globaldefs, num_globaldefs;
  int32_t ofs_fielddefs, num_fielddefs;
  int32_t ofs_functions, num_functions;
  int32_t ofs_strings, num_strings;
  int32_t ofs_globals, num_globals;
  int32_t entityfields;
};

constexpr int kMaxCallDepth = 64;
constexpr int kMaxLocalStack = 4096;
constexpr int64_t kMaxInstructions = 8LL * 1000 * 1000;  // runaway guard

}  // namespace

bool Progs::Load(const uint8_t* data, size_t len) {
  error_.clear();
  if (len < sizeof(Header)) {
    error_ = "progs: truncated header";
    return false;
  }
  Header h;
  std::memcpy(&h, data, sizeof(h));
  if (h.version != 6) {
    error_ = "progs: unsupported version " + std::to_string(h.version);
    return false;
  }
  auto section_ok = [&](int32_t ofs, int32_t num, size_t elem) {
    return ofs >= 0 && num >= 0 &&
           (size_t)ofs + (size_t)num * elem <= len;
  };
  if (!section_ok(h.ofs_statements, h.num_statements, sizeof(DStatement)) ||
      !section_ok(h.ofs_globaldefs, h.num_globaldefs, sizeof(DDef)) ||
      !section_ok(h.ofs_fielddefs, h.num_fielddefs, sizeof(DDef)) ||
      !section_ok(h.ofs_functions, h.num_functions, sizeof(DFunction)) ||
      !section_ok(h.ofs_strings, h.num_strings, 1) ||
      !section_ok(h.ofs_globals, h.num_globals, sizeof(Cell))) {
    error_ = "progs: section out of bounds";
    return false;
  }
  statements_.assign(
      (const DStatement*)(data + h.ofs_statements),
      (const DStatement*)(data + h.ofs_statements) + h.num_statements);
  globaldefs_.assign((const DDef*)(data + h.ofs_globaldefs),
                     (const DDef*)(data + h.ofs_globaldefs) + h.num_globaldefs);
  fielddefs_.assign((const DDef*)(data + h.ofs_fielddefs),
                    (const DDef*)(data + h.ofs_fielddefs) + h.num_fielddefs);
  functions_.assign(
      (const DFunction*)(data + h.ofs_functions),
      (const DFunction*)(data + h.ofs_functions) + h.num_functions);
  strings_.assign((const char*)(data + h.ofs_strings),
                  (const char*)(data + h.ofs_strings) + h.num_strings);
  if (strings_.empty() || strings_.back() != '\0') strings_.push_back('\0');
  globals_.assign((const Cell*)(data + h.ofs_globals),
                  (const Cell*)(data + h.ofs_globals) + h.num_globals);
  num_globals_real_ = h.num_globals;
  // two zero pad cells: vector-width accesses at the last real offset
  // stay in bounds without per-component checks in the hot loop
  globals_.push_back(Cell{});
  globals_.push_back(Cell{});
  entityfields_ = h.entityfields;

  fn_names_.clear();
  fn_by_name_.clear();
  for (size_t i = 0; i < functions_.size(); i++) {
    std::string name = Str(functions_[i].s_name);
    fn_names_.push_back(name);
    if (!name.empty()) fn_by_name_.emplace(name, (int)i);
  }
  global_by_name_.clear();
  for (const DDef& d : globaldefs_) {
    std::string name = Str(d.s_name);
    if (!name.empty()) global_by_name_.emplace(name, d);
  }
  field_by_name_.clear();
  for (const DDef& d : fielddefs_) {
    std::string name = Str(d.s_name);
    if (!name.empty()) field_by_name_.emplace(name, d);
  }
  return true;
}

const char* Progs::Str(int32_t ref) const {
  if (ref >= 0) {
    if ((size_t)ref >= strings_.size()) return "";
    return strings_.data() + ref;
  }
  size_t idx = (size_t)(-1 - ref);
  if (idx >= dynstrings_.size()) return "";
  return dynstrings_[idx].c_str();
}

int32_t Progs::NewString(const std::string& s) {
  dynstrings_.push_back(s);
  return -(int32_t)dynstrings_.size();
}

int Progs::GlobalOfs(const std::string& name) const {
  auto it = global_by_name_.find(name);
  return it == global_by_name_.end() ? -1 : it->second.ofs;
}

int Progs::FieldOfs(const std::string& name) const {
  auto it = field_by_name_.find(name);
  return it == field_by_name_.end() ? -1 : it->second.ofs;
}

uint16_t Progs::FieldType(const std::string& name) const {
  auto it = field_by_name_.find(name);
  return it == field_by_name_.end() ? (uint16_t)ev_void
                                    : (uint16_t)(it->second.type & 0x7fff);
}

int Progs::FunctionIndex(const std::string& name) const {
  auto it = fn_by_name_.find(name);
  return it == fn_by_name_.end() ? -1 : it->second;
}

void Progs::InitEdicts(int max_edicts) {
  edicts_.assign(max_edicts, Edict{});
  for (Edict& e : edicts_) {
    e.free = true;  // the pool starts empty; SpawnServer claims 0 (world)
    e.v.assign(entityfields_, Cell{});
  }
  edicts_[0].free = false;
}

int Progs::AllocEdict(float time) {
  // slot 0 is world; prefer never-used slots, else ones freed > 0.5 s
  // ago (the classic guard against stale entity references)
  for (size_t i = 1; i < edicts_.size(); i++) {
    Edict& e = edicts_[i];
    if (e.free && (e.freetime < 2.0f || time - e.freetime > 0.5f)) {
      e.free = false;
      e.freetime = 0.0f;
      std::fill(e.v.begin(), e.v.end(), Cell{});
      return (int)i;
    }
  }
  RuntimeError("edict pool exhausted");
  return 0;
}

void Progs::FreeEdict(int idx, float time) {
  if (idx <= 0 || idx >= (int)edicts_.size()) return;
  Edict& e = edicts_[idx];
  e.free = true;
  e.freetime = time;
  std::fill(e.v.begin(), e.v.end(), Cell{});
}

void Progs::RuntimeError(const std::string& msg) {
  if (!error_.empty()) return;  // keep the first fault
  std::string where;
  if (current_fn_ >= 0 && current_fn_ < (int)fn_names_.size())
    where = " in " + fn_names_[current_fn_];
  error_ = "progs runtime error" + where + ": " + msg;
}

void Progs::Execute(int fnum) {
  if (fnum <= 0 || fnum >= (int)functions_.size()) {
    RuntimeError("bad function number " + std::to_string(fnum));
    return;
  }
  RunFunction(fnum);
}

// The interpreter: a direct statement loop with an explicit call stack
// (PR_ExecuteProgram semantics: locals of the callee are saved to a
// local stack across calls, parms are copied into the callee's parm
// area).
int Progs::RunFunction(int entry_fnum) {
  const size_t depth0 = callstack_.size();
  int fnum = entry_fnum;
  const DFunction* fn = &functions_[fnum];
  current_fn_ = fnum;

  // enter: save locals, copy parms
  auto enter = [&](int f) -> int {
    const DFunction& df = functions_[f];
    if ((int)callstack_.size() - (int)depth0 >= kMaxCallDepth) {
      RuntimeError("call stack overflow");
      return -1;
    }
    if (localstack_.size() + df.locals > kMaxLocalStack) {
      RuntimeError("locals stack overflow");
      return -1;
    }
    for (int i = 0; i < df.locals; i++)
      localstack_.push_back(globals_[df.parm_start + i]);
    int ofs = df.parm_start;
    for (int i = 0; i < df.numparms; i++) {
      for (int j = 0; j < df.parm_size[i]; j++)
        globals_[ofs++] = globals_[OFS_PARM0 + i * 3 + j];
    }
    current_fn_ = f;
    return df.first_statement;
  };
  auto leave = [&](int f) {
    const DFunction& df = functions_[f];
    for (int i = df.locals - 1; i >= 0; i--) {
      globals_[df.parm_start + i] = localstack_.back();
      localstack_.pop_back();
    }
  };

  int s = enter(fnum);
  if (s < 0) return -1;
  int64_t budget = kMaxInstructions;

  while (true) {
    if (!error_.empty()) return -1;
    if (--budget < 0) {
      RuntimeError("instruction budget exceeded (runaway loop)");
      return -1;
    }
    if (s < 0 || s >= (int)statements_.size()) {
      RuntimeError("statement counter out of range");
      return -1;
    }
    const DStatement& st = statements_[s];
    // operand accessors; a/b/c are signed in jump ops, unsigned offsets
    // otherwise (progs are compiler-produced; bound-check cheaply)
    const uint16_t ua = (uint16_t)st.a, ub = (uint16_t)st.b,
                   uc = (uint16_t)st.c;
    Cell* G = globals_.data();
    auto bad = [&](uint16_t o) { return (int)o >= num_globals_real_; };
    if (bad(ua) || bad(ub) || bad(uc)) {
      RuntimeError("global offset out of range");
      return -1;
    }
    s++;

    switch (st.op) {
      case OP_MUL_F:
        G[uc].f = G[ua].f * G[ub].f;
        break;
      case OP_MUL_V:
        G[uc].f = G[ua].f * G[ub].f + G[ua + 1].f * G[ub + 1].f +
                  G[ua + 2].f * G[ub + 2].f;
        break;
      case OP_MUL_FV:
        G[uc].f = G[ua].f * G[ub].f;
        G[uc + 1].f = G[ua].f * G[ub + 1].f;
        G[uc + 2].f = G[ua].f * G[ub + 2].f;
        break;
      case OP_MUL_VF:
        G[uc].f = G[ua].f * G[ub].f;
        G[uc + 1].f = G[ua + 1].f * G[ub].f;
        G[uc + 2].f = G[ua + 2].f * G[ub].f;
        break;
      case OP_DIV_F:
        G[uc].f = G[ub].f != 0.0f ? G[ua].f / G[ub].f : 0.0f;
        break;
      case OP_ADD_F:
        G[uc].f = G[ua].f + G[ub].f;
        break;
      case OP_ADD_V:
        G[uc].f = G[ua].f + G[ub].f;
        G[uc + 1].f = G[ua + 1].f + G[ub + 1].f;
        G[uc + 2].f = G[ua + 2].f + G[ub + 2].f;
        break;
      case OP_SUB_F:
        G[uc].f = G[ua].f - G[ub].f;
        break;
      case OP_SUB_V:
        G[uc].f = G[ua].f - G[ub].f;
        G[uc + 1].f = G[ua + 1].f - G[ub + 1].f;
        G[uc + 2].f = G[ua + 2].f - G[ub + 2].f;
        break;
      case OP_EQ_F:
        G[uc].f = G[ua].f == G[ub].f;
        break;
      case OP_EQ_V:
        G[uc].f = G[ua].f == G[ub].f && G[ua + 1].f == G[ub + 1].f &&
                  G[ua + 2].f == G[ub + 2].f;
        break;
      case OP_EQ_S:
        G[uc].f = !std::strcmp(Str(G[ua].i), Str(G[ub].i));
        break;
      case OP_EQ_E:
      case OP_EQ_FNC:
        G[uc].f = G[ua].i == G[ub].i;
        break;
      case OP_NE_F:
        G[uc].f = G[ua].f != G[ub].f;
        break;
      case OP_NE_V:
        G[uc].f = G[ua].f != G[ub].f || G[ua + 1].f != G[ub + 1].f ||
                  G[ua + 2].f != G[ub + 2].f;
        break;
      case OP_NE_S:
        G[uc].f = !!std::strcmp(Str(G[ua].i), Str(G[ub].i));
        break;
      case OP_NE_E:
      case OP_NE_FNC:
        G[uc].f = G[ua].i != G[ub].i;
        break;
      case OP_LE:
        G[uc].f = G[ua].f <= G[ub].f;
        break;
      case OP_GE:
        G[uc].f = G[ua].f >= G[ub].f;
        break;
      case OP_LT:
        G[uc].f = G[ua].f < G[ub].f;
        break;
      case OP_GT:
        G[uc].f = G[ua].f > G[ub].f;
        break;

      case OP_LOAD_F:
      case OP_LOAD_S:
      case OP_LOAD_ENT:
      case OP_LOAD_FLD:
      case OP_LOAD_FNC: {
        int e = G[ua].i;
        int fofs = G[ub].i;
        if (e < 0 || e >= (int)edicts_.size() || fofs < 0 ||
            fofs >= entityfields_) {
          RuntimeError("bad entity field load");
          return -1;
        }
        G[uc] = edicts_[e].v[fofs];
        break;
      }
      case OP_LOAD_V: {
        int e = G[ua].i;
        int fofs = G[ub].i;
        if (e < 0 || e >= (int)edicts_.size() || fofs < 0 ||
            fofs + 3 > entityfields_) {
          RuntimeError("bad entity vector load");
          return -1;
        }
        G[uc] = edicts_[e].v[fofs];
        G[uc + 1] = edicts_[e].v[fofs + 1];
        G[uc + 2] = edicts_[e].v[fofs + 2];
        break;
      }

      case OP_ADDRESS: {
        int e = G[ua].i;
        int fofs = G[ub].i;
        if (e < 0 || e >= (int)edicts_.size() || fofs < 0 ||
            fofs >= entityfields_) {
          RuntimeError("bad address");
          return -1;
        }
        G[uc].i = e * entityfields_ + fofs;
        break;
      }

      case OP_STORE_F:
      case OP_STORE_S:
      case OP_STORE_ENT:
      case OP_STORE_FLD:
      case OP_STORE_FNC:
        G[ub] = G[ua];
        break;
      case OP_STORE_V:
        G[ub] = G[ua];
        G[ub + 1] = G[ua + 1];
        G[ub + 2] = G[ua + 2];
        break;

      case OP_STOREP_F:
      case OP_STOREP_S:
      case OP_STOREP_ENT:
      case OP_STOREP_FLD:
      case OP_STOREP_FNC:
      case OP_STOREP_V: {
        int ptr = G[ub].i;
        int e = ptr / entityfields_;
        int fofs = ptr % entityfields_;
        int span = st.op == OP_STOREP_V ? 3 : 1;
        if (ptr < 0 || e >= (int)edicts_.size() ||
            fofs + span > entityfields_) {
          RuntimeError("bad pointer store");
          return -1;
        }
        for (int j = 0; j < span; j++) edicts_[e].v[fofs + j] = G[ua + j];
        break;
      }

      case OP_NOT_F:
        G[uc].f = G[ua].f == 0.0f;
        break;
      case OP_NOT_V:
        G[uc].f = G[ua].f == 0.0f && G[ua + 1].f == 0.0f &&
                  G[ua + 2].f == 0.0f;
        break;
      case OP_NOT_S:
        G[uc].f = G[ua].i == 0 || !*Str(G[ua].i);
        break;
      case OP_NOT_ENT:
      case OP_NOT_FNC:
        G[uc].f = G[ua].i == 0;
        break;

      case OP_IF:
        if (G[ua].i) s += st.b - 1;
        break;
      case OP_IFNOT:
        if (!G[ua].i) s += st.b - 1;
        break;
      case OP_GOTO:
        s += st.a - 1;
        break;
      case OP_AND:
        G[uc].f = G[ua].f != 0.0f && G[ub].f != 0.0f;
        break;
      case OP_OR:
        G[uc].f = G[ua].f != 0.0f || G[ub].f != 0.0f;
        break;
      case OP_BITAND:
        G[uc].f = (float)((int)G[ua].f & (int)G[ub].f);
        break;
      case OP_BITOR:
        G[uc].f = (float)((int)G[ua].f | (int)G[ub].f);
        break;

      case OP_CALL0:
      case OP_CALL1:
      case OP_CALL2:
      case OP_CALL3:
      case OP_CALL4:
      case OP_CALL5:
      case OP_CALL6:
      case OP_CALL7:
      case OP_CALL8: {
        argc_ = st.op - OP_CALL0;
        int f = G[ua].i;
        if (f <= 0 || f >= (int)functions_.size()) {
          RuntimeError("call to bad function " + std::to_string(f));
          return -1;
        }
        const DFunction& callee = functions_[f];
        if (callee.first_statement < 0) {
          int bnum = -callee.first_statement;
          auto it = builtins_.find(bnum);
          if (it == builtins_.end()) {
            RuntimeError("unimplemented builtin #" + std::to_string(bnum) +
                         " (" + fn_names_[f] + ")");
            return -1;
          }
          int save_fn = current_fn_;
          it->second(*this);
          current_fn_ = save_fn;
          if (!error_.empty()) return -1;
          break;
        }
        callstack_.push_back({s, fnum});
        fnum = f;
        fn = &functions_[fnum];
        s = enter(f);
        if (s < 0) return -1;
        break;
      }

      case OP_STATE: {
        // self.frame = a; self.think = b; self.nextthink = time + 0.1
        int self_ofs = GlobalOfs("self");
        int time_ofs = GlobalOfs("time");
        int f_frame = FieldOfs("frame");
        int f_think = FieldOfs("think");
        int f_next = FieldOfs("nextthink");
        if (self_ofs < 0 || time_ofs < 0 || f_frame < 0) {
          RuntimeError("OP_STATE without self/time/frame defs");
          return -1;
        }
        int e = G[self_ofs].i;
        if (e <= 0 || e >= (int)edicts_.size()) {
          RuntimeError("OP_STATE with bad self");
          return -1;
        }
        edicts_[e].v[f_frame].f = G[ua].f;
        if (f_think >= 0) edicts_[e].v[f_think].i = G[ub].i;
        if (f_next >= 0)
          edicts_[e].v[f_next].f = G[time_ofs].f + 0.1f;
        break;
      }

      case OP_DONE:
      case OP_RETURN: {
        G[OFS_RETURN] = G[ua];
        G[OFS_RETURN + 1] = G[(uint16_t)(ua + 1)];
        G[OFS_RETURN + 2] = G[(uint16_t)(ua + 2)];
        leave(fnum);
        if (callstack_.size() == depth0) {
          current_fn_ = -1;
          return 0;  // fell off the entry function
        }
        StackFrame fr = callstack_.back();
        callstack_.pop_back();
        fnum = fr.fnum;
        fn = &functions_[fnum];
        current_fn_ = fnum;
        s = fr.ret_statement;
        break;
      }

      default:
        RuntimeError("bad opcode " + std::to_string(st.op));
        return -1;
    }
  }
  (void)fn;
}

}  // namespace mqgame
