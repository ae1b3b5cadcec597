"""A deliberately small ES5 interpreter — test infrastructure only.

This image ships no browser and no JS engine (no node, no quickjs), yet the
dashboard frontend (`dashboard/static/script.js`) is real production code
whose runtime behavior we want under test: slideshow ticks, prev/next
clicks, fetch→DOM updates.  This module implements just enough of ES5 to
*execute* that script against a DOM stub: closures, var scoping, `this`
binding, object/array literals, the operator set the script uses,
setInterval with a virtual clock, and promise-like thenables for fetch.

It is NOT a general JS engine — unsupported syntax raises immediately, so
if the dashboard script grows beyond the subset, the runtime test fails
loudly rather than silently skipping.
"""

from __future__ import annotations

import math
import re
from typing import Any, Callable, Dict, List, Optional, Tuple


class Undefined:
    _inst = None

    def __new__(cls):
        if cls._inst is None:
            cls._inst = super().__new__(cls)
        return cls._inst

    def __repr__(self):
        return "undefined"

    def __bool__(self):
        return False


UNDEF = Undefined()
NULL = None

# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

KEYWORDS = {
    "var", "function", "return", "if", "else", "for", "while", "new",
    "true", "false", "null", "undefined", "typeof", "this", "in", "of",
    "break", "continue",
}
PUNCT = [
    "===", "!==", "<<=", ">>=", "++", "--", "+=", "-=", "*=", "/=", "%=",
    "==", "!=", "<=", ">=", "&&", "||", "=>",
    "{", "}", "(", ")", "[", "]", ";", ",", ".", "?", ":", "=", "+", "-",
    "*", "/", "%", "<", ">", "!", "&", "|",
]
_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+|//[^\n]*|/\*.*?\*/)
  | (?P<num>\d+(?:\.\d+)?)
  | (?P<str>"(?:\\.|[^"\\])*"|'(?:\\.|[^'\\])*')
  | (?P<ident>[A-Za-z_$][\w$]*)
  | (?P<punct>%s)
""" % "|".join(re.escape(p) for p in PUNCT),
    re.VERBOSE | re.DOTALL,
)

_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "\\": "\\", '"': '"', "'": "'", "/": "/"}


def tokenize(src: str) -> List[Tuple[str, Any]]:
    toks, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise SyntaxError(f"jsmini: cannot tokenize at {src[pos:pos+30]!r}")
        pos = m.end()
        if m.lastgroup == "ws":
            continue
        if m.lastgroup == "num":
            v = m.group()
            toks.append(("num", float(v) if "." in v else int(v)))
        elif m.lastgroup == "str":
            raw = m.group()[1:-1]
            out, i = [], 0
            while i < len(raw):
                if raw[i] == "\\" and i + 1 < len(raw):
                    out.append(_ESCAPES.get(raw[i + 1], raw[i + 1]))
                    i += 2
                else:
                    out.append(raw[i])
                    i += 1
            toks.append(("str", "".join(out)))
        elif m.lastgroup == "ident":
            w = m.group()
            toks.append(("kw" if w in KEYWORDS else "ident", w))
        else:
            toks.append(("punct", m.group()))
    toks.append(("eof", None))
    return toks


# ---------------------------------------------------------------------------
# parser → tuple AST
# ---------------------------------------------------------------------------


class Parser:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self, k=0):
        return self.toks[self.i + k]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind, val=None):
        t = self.next()
        if t[0] != kind or (val is not None and t[1] != val):
            raise SyntaxError(f"jsmini: expected {kind} {val}, got {t}")
        return t

    def at(self, kind, val=None):
        t = self.peek()
        return t[0] == kind and (val is None or t[1] == val)

    def eat(self, kind, val=None):
        if self.at(kind, val):
            return self.next()
        return None

    # -- statements ---------------------------------------------------------

    def parse_program(self):
        stmts = []
        while not self.at("eof"):
            stmts.append(self.statement())
        return ("block", stmts)

    def statement(self):
        if self.at("punct", "{"):
            return self.block()
        if self.at("kw", "var"):
            self.next()
            decls = []
            while True:
                name = self.expect("ident")[1]
                init = None
                if self.eat("punct", "="):
                    init = self.assignment()
                decls.append((name, init))
                if not self.eat("punct", ","):
                    break
            self.eat("punct", ";")
            return ("var", decls)
        if self.at("kw", "function") and self.peek(1)[0] == "ident":
            self.next()
            name = self.next()[1]
            params, body = self.function_rest()
            return ("funcdecl", name, params, body)
        if self.at("kw", "return"):
            self.next()
            val = None
            if not self.at("punct", ";") and not self.at("punct", "}"):
                val = self.expression()
            self.eat("punct", ";")
            return ("return", val)
        if self.at("kw", "if"):
            self.next()
            self.expect("punct", "(")
            cond = self.expression()
            self.expect("punct", ")")
            then = self.statement()
            other = None
            if self.eat("kw", "else"):
                other = self.statement()
            return ("if", cond, then, other)
        if self.at("kw", "for"):
            self.next()
            self.expect("punct", "(")
            init = None
            if not self.at("punct", ";"):
                if self.at("kw", "var"):
                    init = self.statement()  # consumes its own ';'
                else:
                    init = ("expr", self.expression())
                    self.expect("punct", ";")
            else:
                self.next()
            cond = None if self.at("punct", ";") else self.expression()
            self.expect("punct", ";")
            upd = None if self.at("punct", ")") else self.expression()
            self.expect("punct", ")")
            body = self.statement()
            return ("for", init, cond, upd, body)
        if self.at("kw", "while"):
            self.next()
            self.expect("punct", "(")
            cond = self.expression()
            self.expect("punct", ")")
            return ("while", cond, self.statement())
        if self.eat("kw", "break"):
            self.eat("punct", ";")
            return ("break",)
        if self.eat("kw", "continue"):
            self.eat("punct", ";")
            return ("continue",)
        if self.eat("punct", ";"):
            return ("empty",)
        e = self.expression()
        self.eat("punct", ";")
        return ("expr", e)

    def block(self):
        self.expect("punct", "{")
        stmts = []
        while not self.at("punct", "}"):
            stmts.append(self.statement())
        self.expect("punct", "}")
        return ("block", stmts)

    def function_rest(self):
        self.expect("punct", "(")
        params = []
        while not self.at("punct", ")"):
            params.append(self.expect("ident")[1])
            if not self.eat("punct", ","):
                break
        self.expect("punct", ")")
        return params, self.block()

    # -- expressions (precedence climbing) -----------------------------------

    def expression(self):
        e = self.assignment()
        while self.eat("punct", ","):
            e = ("seq", e, self.assignment())
        return e

    def assignment(self):
        left = self.ternary()
        for op in ("=", "+=", "-=", "*=", "/=", "%="):
            if self.at("punct", op):
                self.next()
                if left[0] not in ("ident", "member", "index"):
                    raise SyntaxError("jsmini: bad assignment target")
                return ("assign", op, left, self.assignment())
        return left

    def ternary(self):
        cond = self.logic_or()
        if self.eat("punct", "?"):
            a = self.assignment()
            self.expect("punct", ":")
            b = self.assignment()
            return ("ternary", cond, a, b)
        return cond

    def _binary(self, sub, ops):
        e = sub()
        while True:
            for op in ops:
                if self.at("punct", op):
                    self.next()
                    e = ("binop", op, e, sub())
                    break
            else:
                return e

    def logic_or(self):
        return self._binary(self.logic_and, ("||",))

    def logic_and(self):
        return self._binary(self.equality, ("&&",))

    def equality(self):
        return self._binary(self.relational, ("===", "!==", "==", "!="))

    def relational(self):
        return self._binary(self.additive, ("<=", ">=", "<", ">"))

    def additive(self):
        return self._binary(self.multiplicative, ("+", "-"))

    def multiplicative(self):
        return self._binary(self.unary, ("*", "/", "%"))

    def unary(self):
        if self.at("punct", "!"):
            self.next()
            return ("not", self.unary())
        if self.at("punct", "-"):
            self.next()
            return ("neg", self.unary())
        if self.at("punct", "+"):
            self.next()
            return ("pos", self.unary())
        if self.at("kw", "typeof"):
            self.next()
            return ("typeof", self.unary())
        if self.at("punct", "++") or self.at("punct", "--"):
            op = self.next()[1]
            return ("preincr", op, self.unary())
        return self.postfix()

    def postfix(self):
        e = self.call_member()
        if self.at("punct", "++") or self.at("punct", "--"):
            op = self.next()[1]
            return ("postincr", op, e)
        return e

    def call_member(self, callee=None):
        e = callee if callee is not None else self.primary()
        while True:
            if self.eat("punct", "."):
                name = self.next()
                if name[0] not in ("ident", "kw"):
                    raise SyntaxError(f"jsmini: bad member {name}")
                e = ("member", e, name[1])
            elif self.at("punct", "["):
                self.next()
                idx = self.expression()
                self.expect("punct", "]")
                e = ("index", e, idx)
            elif self.at("punct", "("):
                self.next()
                args = []
                while not self.at("punct", ")"):
                    args.append(self.assignment())
                    if not self.eat("punct", ","):
                        break
                self.expect("punct", ")")
                e = ("call", e, args)
            else:
                return e

    def primary(self):
        if self.at("num"):
            return ("lit", self.next()[1])
        if self.at("str"):
            return ("lit", self.next()[1])
        if self.eat("kw", "true"):
            return ("lit", True)
        if self.eat("kw", "false"):
            return ("lit", False)
        if self.eat("kw", "null"):
            return ("lit", NULL)
        if self.eat("kw", "undefined"):
            return ("lit", UNDEF)
        if self.eat("kw", "this"):
            return ("this",)
        if self.at("kw", "new"):
            self.next()
            callee = self.primary()
            while self.eat("punct", "."):
                callee = ("member", callee, self.expect("ident")[1])
            args = []
            if self.eat("punct", "("):
                while not self.at("punct", ")"):
                    args.append(self.assignment())
                    if not self.eat("punct", ","):
                        break
                self.expect("punct", ")")
            return self.call_member(("new", callee, args))
        if self.at("kw", "function"):
            self.next()
            name = self.next()[1] if self.at("ident") else None
            params, body = self.function_rest()
            return ("func", name, params, body)
        if self.at("ident"):
            return ("ident", self.next()[1])
        if self.eat("punct", "("):
            e = self.expression()
            self.expect("punct", ")")
            return e
        if self.at("punct", "["):
            self.next()
            items = []
            while not self.at("punct", "]"):
                items.append(self.assignment())
                if not self.eat("punct", ","):
                    break
            self.expect("punct", "]")
            return ("array", items)
        if self.at("punct", "{"):
            self.next()
            props = []
            while not self.at("punct", "}"):
                k = self.next()
                if k[0] not in ("ident", "str", "kw", "num"):
                    raise SyntaxError(f"jsmini: bad object key {k}")
                self.expect("punct", ":")
                props.append((k[1], self.assignment()))
                if not self.eat("punct", ","):
                    break
            self.expect("punct", "}")
            return ("object", props)
        raise SyntaxError(f"jsmini: unexpected token {self.peek()}")


# ---------------------------------------------------------------------------
# runtime values
# ---------------------------------------------------------------------------


class JSFunction:
    def __init__(self, name, params, body, env):
        self.name = name or "<anon>"
        self.params = params
        self.body = body
        self.env = env

    def __repr__(self):
        return f"<jsfn {self.name}>"


class Env:
    def __init__(self, parent=None):
        self.vars: Dict[str, Any] = {}
        self.parent = parent

    def lookup(self, name):
        e = self
        while e is not None:
            if name in e.vars:
                return e.vars[name]
            e = e.parent
        raise NameError(f"jsmini: {name} is not defined")

    def set(self, name, value):
        e = self
        while e is not None:
            if name in e.vars:
                e.vars[name] = value
                return
            e = e.parent
        # implicit global (non-strict fallback; our script never relies on it)
        root = self
        while root.parent is not None:
            root = root.parent
        root.vars[name] = value

    def declare(self, name, value):
        self.vars[name] = value


class _Return(Exception):
    def __init__(self, value):
        self.value = value


class _Break(Exception):
    pass


class _Continue(Exception):
    pass


class MiniPromise:
    """Thenable with synchronous-microtask semantics (enough for fetch)."""

    def __init__(self, interp):
        self.interp = interp
        self.state: Optional[str] = None  # None | fulfilled | rejected
        self.value = None
        self._cbs: List[Tuple[Optional[Any], Optional[Any], "MiniPromise"]] = []

    def resolve(self, value):
        if self.state is None:
            if isinstance(value, MiniPromise):
                value.then(lambda v: self.resolve(v), lambda e: self.reject(e))
                return
            self.state, self.value = "fulfilled", value
            self._drain()

    def reject(self, err):
        if self.state is None:
            self.state, self.value = "rejected", err
            self._drain()

    def _drain(self):
        cbs, self._cbs = self._cbs, []
        for on_ok, on_err, nxt in cbs:
            self.interp.microtasks.append((self, on_ok, on_err, nxt))

    def then(self, on_ok=None, on_err=None):
        nxt = MiniPromise(self.interp)
        self._cbs.append((on_ok, on_err, nxt))
        if self.state is not None:
            self._drain()
        return nxt

    def catch(self, on_err):
        return self.then(None, on_err)


class Interpreter:
    def __init__(self, global_vars: Optional[Dict[str, Any]] = None):
        self.globals = Env()
        self.microtasks: List[tuple] = []
        self.timers: Dict[int, dict] = {}
        self._timer_id = 0
        self.now_ms = 0.0
        self.console: List[Tuple[str, tuple]] = []
        self._install_builtins()
        for k, v in (global_vars or {}).items():
            self.globals.declare(k, v)

    # -- builtins -------------------------------------------------------------

    def _install_builtins(self):
        g = self.globals

        def set_interval(fn, ms):
            self._timer_id += 1
            self.timers[self._timer_id] = {
                "fn": fn, "ms": float(ms), "next": self.now_ms + float(ms),
                "repeat": True,
            }
            return self._timer_id

        def set_timeout(fn, ms):
            tid = set_interval(fn, ms)
            self.timers[tid]["repeat"] = False
            return tid

        def clear_interval(tid):
            self.timers.pop(int(tid) if tid is not UNDEF and tid is not None else -1, None)
            return UNDEF

        def parse_int(s, base=10):
            try:
                return int(str(s).strip().split(".")[0], int(base))
            except ValueError:
                return float("nan")

        class DateInstance:
            def __init__(self, ms):
                self._ms = ms

            def getTime(self):
                return self._ms

            def toLocaleString(self, *locale):
                # virtual-clock rendering; real formatting is irrelevant here
                return f"virtual {self._ms / 1000.0:.3f}s"

            toLocaleTimeString = toLocaleString
            toLocaleDateString = toLocaleString

        class DateHost:
            pass

        date = DateHost()
        date.now = lambda: self.now_ms
        date.js_construct = lambda *a: DateInstance(a[0] if a else self.now_ms)
        g.declare("Date", date)
        g.declare("setInterval", set_interval)
        g.declare("setTimeout", set_timeout)
        g.declare("clearInterval", clear_interval)
        g.declare("clearTimeout", clear_interval)
        g.declare("parseInt", parse_int)
        g.declare("Number", lambda v=UNDEF: float(v) if v not in (UNDEF, NULL, "") else 0.0)
        g.declare("String", lambda v=UNDEF: self.to_str(v))
        g.declare("NaN", float("nan"))
        g.declare("isNaN", lambda v: isinstance(v, float) and v != v)

        class Console:
            def __init__(self, sink):
                self._sink = sink

            def log(self, *a):
                self._sink.append(("log", a))
                return UNDEF

            def error(self, *a):
                self._sink.append(("error", a))
                return UNDEF

            warn = error

        g.declare("console", Console(self.console))

    # -- program execution ------------------------------------------------------

    def run(self, source: str):
        ast = Parser(tokenize(source)).parse_program()
        self.exec_block(ast, self.globals, this=UNDEF)
        self.flush()

    def flush(self):
        """Run microtasks to quiescence."""
        guard = 0
        while self.microtasks:
            guard += 1
            if guard > 100_000:
                raise RuntimeError("jsmini: microtask storm")
            promise, on_ok, on_err, nxt = self.microtasks.pop(0)
            cb = on_ok if promise.state == "fulfilled" else on_err
            if cb is None:
                # pass through
                if promise.state == "fulfilled":
                    nxt.resolve(promise.value)
                else:
                    nxt.reject(promise.value)
                continue
            try:
                out = cb(promise.value) if callable(cb) else self.call(cb, [promise.value])
                nxt.resolve(out)
            except Exception as e:  # noqa: BLE001 — JS catch semantics
                nxt.reject(str(e))

    def advance(self, ms: float):
        """Advance the virtual clock, firing due timers in order."""
        target = self.now_ms + ms
        while True:
            due = [
                (t["next"], tid) for tid, t in self.timers.items() if t["next"] <= target
            ]
            if not due:
                break
            due.sort()
            _, tid = due[0]
            t = self.timers.get(tid)
            if t is None:
                continue
            self.now_ms = max(self.now_ms, t["next"])
            if t["repeat"]:
                t["next"] += t["ms"]
            else:
                del self.timers[tid]
            self.call(t["fn"], [])
            self.flush()
        self.now_ms = target

    # -- calling --------------------------------------------------------------

    def call(self, fn, args, this=UNDEF):
        if isinstance(fn, JSFunction):
            env = Env(fn.env)
            for i, p in enumerate(fn.params):
                env.declare(p, args[i] if i < len(args) else UNDEF)
            env.declare("arguments", list(args))
            self._hoist(fn.body, env)
            try:
                self.exec_block(fn.body, env, this)
            except _Return as r:
                return r.value
            return UNDEF
        if callable(fn):
            return fn(*args)
        raise TypeError(f"jsmini: {fn!r} is not callable")

    # -- statements -------------------------------------------------------------

    def _hoist(self, block, env):
        """Function-scope hoisting per ES5: ``var`` and function
        declarations reach function scope regardless of block nesting
        (stopping at nested function boundaries) — scanning only the top
        level left vars inside untaken if/for branches undeclared
        (NameError where JS reads undefined)."""

        def walk(st):
            kind = st[0]
            if kind == "funcdecl":
                env.declare(st[1], JSFunction(st[1], st[2], st[3], env))
            elif kind == "var":
                for name, _ in st[1]:
                    if name not in env.vars:
                        env.declare(name, UNDEF)
            elif kind == "if":
                walk(st[2])
                if st[3]:
                    walk(st[3])
            elif kind == "block":
                for s in st[1]:
                    walk(s)
            elif kind == "for":
                if st[1]:
                    walk(st[1])
                walk(st[4])
            elif kind == "while":
                walk(st[2])

        for st in block[1]:
            walk(st)

    def exec_block(self, block, env, this):
        self._hoist(block, env)
        for st in block[1]:
            self.exec_stmt(st, env, this)

    def exec_stmt(self, st, env, this):
        kind = st[0]
        if kind == "expr":
            self.eval(st[1], env, this)
        elif kind == "var":
            for name, init in st[1]:
                if init:
                    env.declare(name, self.eval(init, env, this))
                elif name not in env.vars:
                    # a bare `var x` after an assignment keeps the value in
                    # JS — re-declaring would reset it to undefined
                    env.declare(name, UNDEF)
        elif kind == "funcdecl":
            env.declare(st[1], JSFunction(st[1], st[2], st[3], env))
        elif kind == "return":
            raise _Return(self.eval(st[1], env, this) if st[1] else UNDEF)
        elif kind == "if":
            if self.truthy(self.eval(st[1], env, this)):
                self.exec_stmt(st[2], env, this)
            elif st[3]:
                self.exec_stmt(st[3], env, this)
        elif kind == "block":
            self.exec_block(st, env, this)
        elif kind == "for":
            if st[1]:
                self.exec_stmt(st[1], env, this)
            while st[2] is None or self.truthy(self.eval(st[2], env, this)):
                try:
                    self.exec_stmt(st[4], env, this)
                except _Break:
                    break
                except _Continue:
                    pass
                if st[3]:
                    self.eval(st[3], env, this)
        elif kind == "while":
            while self.truthy(self.eval(st[1], env, this)):
                try:
                    self.exec_stmt(st[2], env, this)
                except _Break:
                    break
                except _Continue:
                    pass
        elif kind == "break":
            raise _Break()
        elif kind == "continue":
            raise _Continue()
        elif kind == "empty":
            pass
        else:
            raise RuntimeError(f"jsmini: unknown statement {kind}")

    # -- expressions -------------------------------------------------------------

    def eval(self, e, env, this):
        kind = e[0]
        if kind == "lit":
            return e[1]
        if kind == "ident":
            return env.lookup(e[1])
        if kind == "this":
            return this
        if kind == "func":
            return JSFunction(e[1], e[2], e[3], env)
        if kind == "array":
            return [self.eval(x, env, this) for x in e[1]]
        if kind == "object":
            return {k: self.eval(v, env, this) for k, v in e[1]}
        if kind == "member":
            return self.get_member(self.eval(e[1], env, this), e[2])
        if kind == "index":
            obj = self.eval(e[1], env, this)
            idx = self.eval(e[2], env, this)
            if isinstance(obj, (list, str)) or hasattr(obj, "__getitem__"):
                try:
                    if isinstance(idx, float) and idx.is_integer():
                        idx = int(idx)
                    if isinstance(obj, dict):
                        return obj.get(idx, UNDEF)
                    return obj[idx]
                except (IndexError, KeyError):
                    return UNDEF
            return self.get_member(obj, str(idx))
        if kind == "call":
            return self.eval_call(e, env, this)
        if kind == "new":
            callee = self.eval(e[1], env, this)
            args = [self.eval(a, env, this) for a in e[2]]
            ctor = getattr(callee, "js_construct", None)
            if ctor is not None:
                return ctor(*args)
            if isinstance(callee, JSFunction):
                obj: Dict[str, Any] = {}
                self.call(callee, args, this=obj)
                return obj
            raise TypeError(f"jsmini: cannot construct {callee!r}")
        if kind == "assign":
            return self.eval_assign(e, env, this)
        if kind == "ternary":
            return (
                self.eval(e[2], env, this)
                if self.truthy(self.eval(e[1], env, this))
                else self.eval(e[3], env, this)
            )
        if kind == "binop":
            op = e[1]
            if op == "&&":
                left = self.eval(e[2], env, this)
                return self.eval(e[3], env, this) if self.truthy(left) else left
            if op == "||":
                left = self.eval(e[2], env, this)
                return left if self.truthy(left) else self.eval(e[3], env, this)
            return self.binop(op, self.eval(e[2], env, this), self.eval(e[3], env, this))
        if kind == "not":
            return not self.truthy(self.eval(e[1], env, this))
        if kind == "neg":
            return -self.eval(e[1], env, this)
        if kind == "pos":
            return +self.eval(e[1], env, this)
        if kind == "typeof":
            try:
                v = self.eval(e[1], env, this)
            except NameError:
                return "undefined"
            if v is UNDEF:
                return "undefined"
            if v is None:
                return "object"
            if isinstance(v, bool):
                return "boolean"
            if isinstance(v, (int, float)):
                return "number"
            if isinstance(v, str):
                return "string"
            if isinstance(v, JSFunction) or callable(v):
                return "function"
            return "object"
        if kind in ("preincr", "postincr"):
            tgt = e[2]
            old = self.eval(tgt, env, this)
            new = old + (1 if e[1] == "++" else -1)
            self.assign_to(tgt, new, env, this)
            return new if kind == "preincr" else old
        if kind == "seq":
            self.eval(e[1], env, this)
            return self.eval(e[2], env, this)
        raise RuntimeError(f"jsmini: unknown expression {kind}")

    def eval_call(self, e, env, this):
        callee = e[1]
        args = [self.eval(a, env, this) for a in e[2]]
        if callee[0] == "member":
            obj = self.eval(callee[1], env, this)
            fn = self.get_member(obj, callee[2])
            if fn is UNDEF:
                raise TypeError(f"jsmini: {callee[2]} is not a function on {obj!r}")
            if isinstance(fn, JSFunction):
                return self.call(fn, args, this=obj)
            return fn(*args)
        if callee[0] == "index":
            obj = self.eval(callee[1], env, this)
            fn = self.eval(("index",) + callee[1:], env, this)
            if isinstance(fn, JSFunction):
                return self.call(fn, args, this=obj)
            return fn(*args)
        fn = self.eval(callee, env, this)
        return self.call(fn, args, this=UNDEF)

    def eval_assign(self, e, env, this):
        _, op, target, value_expr = e
        value = self.eval(value_expr, env, this)
        if op != "=":
            old = self.eval(target, env, this)
            value = self.binop(op[0], old, value)
        self.assign_to(target, value, env, this)
        return value

    def assign_to(self, target, value, env, this):
        if target[0] == "ident":
            env.set(target[1], value)
        elif target[0] == "member":
            self.set_member(self.eval(target[1], env, this), target[2], value)
        elif target[0] == "index":
            obj = self.eval(target[1], env, this)
            idx = self.eval(target[2], env, this)
            if isinstance(idx, float) and idx.is_integer():
                idx = int(idx)
            if isinstance(obj, dict):
                obj[idx] = value
            elif isinstance(obj, list):
                obj[idx] = value
            else:
                self.set_member(obj, str(idx), value)
        else:
            raise RuntimeError("jsmini: bad assignment target")

    # -- member access / host bridge ------------------------------------------

    def get_member(self, obj, name):
        if obj is UNDEF or obj is None:
            raise TypeError(f"jsmini: cannot read {name!r} of {obj!r}")
        if isinstance(obj, dict):
            return obj.get(name, UNDEF)
        if isinstance(obj, list):
            return self._array_member(obj, name)
        if isinstance(obj, str):
            if name == "length":
                return len(obj)
            if name in ("toLowerCase", "toUpperCase", "trim"):
                return {"toLowerCase": obj.lower, "toUpperCase": obj.upper,
                        "trim": obj.strip}[name]
            if name == "indexOf":
                return lambda sub, start=0: obj.find(sub, int(start))
            if name == "replace":
                return lambda a, b: obj.replace(a, b, 1)
            if name == "split":
                return lambda sep: obj.split(sep)
            return UNDEF
        if isinstance(obj, MiniPromise):
            if name == "then":
                return lambda ok=None, err=None: obj.then(
                    self._as_callable(ok), self._as_callable(err)
                )
            if name == "catch":
                return lambda err: obj.catch(self._as_callable(err))
            return UNDEF
        # host object
        val = getattr(obj, name, UNDEF)
        return val

    def _as_callable(self, fn):
        if fn is None or fn is UNDEF:
            return None
        if isinstance(fn, JSFunction):
            return lambda v: self.call(fn, [v])
        return fn

    def _array_member(self, arr: list, name: str):
        if name == "length":
            return len(arr)
        if name == "push":
            return lambda *xs: (arr.extend(xs), len(arr))[1]
        if name == "map":
            return lambda fn: [self.call(fn, [v, i]) for i, v in enumerate(arr)]
        if name == "forEach":
            def _each(fn):
                for i, v in enumerate(list(arr)):
                    self.call(fn, [v, i])
                return UNDEF
            return _each
        if name == "concat":
            return lambda *others: sum(
                ([o] if not isinstance(o, list) else o for o in others), arr[:]
            )
        if name == "filter":
            return lambda fn: [v for i, v in enumerate(arr) if self.truthy(self.call(fn, [v, i]))]
        if name == "indexOf":
            return lambda v: arr.index(v) if v in arr else -1
        if name == "join":
            return lambda sep=",": sep.join(self.to_str(v) for v in arr)
        if name == "slice":
            return lambda a=0, b=None: arr[int(a) : (None if b is None else int(b))]
        return UNDEF

    def set_member(self, obj, name, value):
        if isinstance(obj, dict):
            obj[name] = value
        else:
            setattr(obj, name, value)

    # -- semantics helpers -------------------------------------------------------

    @staticmethod
    def truthy(v) -> bool:
        if v is UNDEF or v is None:
            return False
        if isinstance(v, float) and v != v:  # NaN
            return False
        if isinstance(v, (int, float, str, bool)):
            return bool(v)
        return True  # objects/arrays/functions are truthy (even empty)

    def to_str(self, v) -> str:
        if v is UNDEF:
            return "undefined"
        if v is None:
            return "null"
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, float) and v.is_integer():
            return str(int(v))
        return str(v)

    def binop(self, op, a, b):
        if op == "+":
            if isinstance(a, str) or isinstance(b, str):
                return self.to_str(a) + self.to_str(b)
            return a + b
        if op == "-":
            return a - b
        if op == "*":
            return a * b
        if op == "/":
            return a / b
        if op == "%":
            # JS % is TRUNCATED remainder (sign of the dividend); Python's
            # is floored — (-1) % 6 is -1 in every browser but 5 here, the
            # silent-divergence class this module promises to exclude
            if b == 0:
                return float("nan")
            return a - b * math.trunc(a / b)
        if op in ("==", "==="):
            return self._strict_eq(a, b) if op == "===" else self._loose_eq(a, b)
        if op in ("!=", "!=="):
            return not (self._strict_eq(a, b) if op == "!==" else self._loose_eq(a, b))
        if op == "<":
            return a < b
        if op == ">":
            return a > b
        if op == "<=":
            return a <= b
        if op == ">=":
            return a >= b
        raise RuntimeError(f"jsmini: unknown operator {op}")

    def _loose_eq(self, a, b):
        """ES5 abstract equality (11.9.3) over the supported value subset —
        Python's ``==`` has neither the null==undefined rule nor the
        number/string coercion ('1' == 1 is true in JS)."""
        if type(a) is bool:
            return self._loose_eq(1 if a else 0, b)
        if type(b) is bool:
            return self._loose_eq(a, 1 if b else 0)
        a_nullish = a is UNDEF or a is None
        b_nullish = b is UNDEF or b is None
        if a_nullish or b_nullish:
            return a_nullish and b_nullish
        if isinstance(a, (int, float)) and isinstance(b, str):
            return self._loose_eq(a, self._str_to_num(b))
        if isinstance(a, str) and isinstance(b, (int, float)):
            return self._loose_eq(self._str_to_num(a), b)
        if isinstance(a, (int, float)) and isinstance(b, (int, float)):
            return a == b and not (a != a or b != b)  # NaN != NaN
        if isinstance(a, str) and isinstance(b, str):
            return a == b
        return a is b

    @staticmethod
    def _str_to_num(s: str) -> float:
        s = s.strip()
        if s == "":
            return 0.0
        try:
            return float(s)
        except ValueError:
            return float("nan")

    @staticmethod
    def _strict_eq(a, b):
        if type(a) is bool or type(b) is bool:
            return a is b
        if isinstance(a, (int, float)) and isinstance(b, (int, float)):
            return a == b
        if isinstance(a, str) and isinstance(b, str):
            return a == b
        return a is b
