"""Finite-automaton URL filter — urlfilter-automaton analog.

Reference semantics (AutomatonURLFilter.java:80-105): each ``±regex``
rule compiles ``new RegExp(regex, RegExp.ALL).toAutomaton()`` and a URL
matches a rule when ``RunAutomaton.run(url)`` accepts — i.e.
**full-string** acceptance, unlike urlfilter-regex's substring
``find()`` — with the brics extensions enabled by ``RegExp.ALL``:
``~`` complement, ``&`` intersection, ``@`` any-string, ``#`` empty
language, ``"..."`` quoted literals, ``<n-m>`` numeric intervals.
Rule-chain semantics are shared with the regex family
(RegexURLFilterBase.java:144-152): first matching rule wins, ``+``
accepts, ``-`` rejects, no match rejects.

Spark-first design: the WHOLE rule file compiles into ONE product DFA
whose accept states carry the index of the first (lowest-priority-
number) matching rule, so classifying a URL is a single O(len(url))
table walk with no backtracking and no per-rule loop — the property
that makes automata the production choice for hot-path filtering on a
100 TB frontier. The batch runner is numpy-vectorized: a codepoint
matrix for the whole Arrow batch, equivalence classes via one
``searchsorted``, then one gathered transition per character position
for every URL simultaneously. No per-row Python in the match loop.

This is an original implementation (parser → Thompson NFA → subset
DFA, with determinize-complement for ``~`` and product construction
for ``&``); dk.brics.automaton is used only as the behavioral spec.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

MAX_CP = 0x110000  # exclusive upper bound of the unicode alphabet
MAX_DFA_STATES = 100_000  # blowup guard (subset construction is 2^n)


# --------------------------------------------------------------------
# brics RegExp parser (grammar: RegExp.java class javadoc)
#
#   unionexp   ::= interexp ( '|' unionexp )?
#   interexp   ::= concatexp ( '&' interexp )?
#   concatexp  ::= repeatexp concatexp?
#   repeatexp  ::= repeatexp ( '?' | '*' | '+' | {n} | {n,} | {n,m} )
#                | complexp
#   complexp   ::= '~' complexp | charclassexp
#   charclassexp ::= '[' '^'? charclasses ']' | simpleexp
#   simpleexp  ::= charexp | '.' | '#' | '@' | '"' str '"' | '(' ')'
#                | '(' unionexp ')' | '<' n '-' m '>'
#   charexp    ::= any char | '\' any char
#
# AST nodes are tuples: ('set', ((lo,hi),...)), ('eps',), ('none',),
# ('any*',), ('cat',a,b), ('or',a,b), ('and',a,b), ('not',a),
# ('star',a), ('plus',a), ('opt',a), ('rep',a,n,m|None)
# --------------------------------------------------------------------


class _Parser:
    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def _peek(self):
        return self.s[self.i] if self.i < len(self.s) else None

    def _next(self):
        if self.i >= len(self.s):
            raise ValueError(f"unexpected end of regex: {self.s!r}")
        c = self.s[self.i]
        self.i += 1
        return c

    def parse(self):
        node = self._union()
        if self.i != len(self.s):
            raise ValueError(
                f"trailing input at {self.i} in regex {self.s!r}")
        return node

    def _union(self):
        a = self._inter()
        if self._peek() == "|":
            self._next()
            return ("or", a, self._union())
        return a

    def _inter(self):
        a = self._concat()
        if self._peek() == "&":
            self._next()
            return ("and", a, self._inter())
        return a

    def _concat(self):
        a = self._repeat()
        if self._peek() not in (None, "|", "&", ")"):
            return ("cat", a, self._concat())
        return a

    def _repeat(self):
        a = self._complement()
        while True:
            c = self._peek()
            if c == "?":
                self._next()
                a = ("opt", a)
            elif c == "*":
                self._next()
                a = ("star", a)
            elif c == "+":
                self._next()
                a = ("plus", a)
            elif c == "{":
                self._next()
                digits = ""
                while self._peek() is not None and self._peek().isdigit():
                    digits += self._next()
                n = int(digits)
                if self._peek() == "}":
                    self._next()
                    a = ("rep", a, n, n)
                elif self._peek() == ",":
                    self._next()
                    if self._peek() == "}":
                        self._next()
                        a = ("rep", a, n, None)
                    else:
                        digits = ""
                        while (self._peek() is not None
                               and self._peek().isdigit()):
                            digits += self._next()
                        m = int(digits)
                        if self._next() != "}":
                            raise ValueError("expected }")
                        a = ("rep", a, n, m)
                else:
                    raise ValueError("expected } or , in repetition")
            else:
                return a

    def _complement(self):
        if self._peek() == "~":
            self._next()
            return ("not", self._complement())
        return self._charclassexp()

    def _charclassexp(self):
        if self._peek() == "[":
            self._next()
            negate = False
            if self._peek() == "^":
                self._next()
                negate = True
            ivals = []
            while self._peek() != "]":
                lo = self._charexp_cp()
                hi = lo
                if self._peek() == "-" and self.s[self.i + 1:self.i + 2] != "]":
                    self._next()
                    hi = self._charexp_cp()
                if hi < lo:
                    raise ValueError("inverted range in char class")
                ivals.append((lo, hi))
            self._next()  # ']'
            ivals = _merge(ivals)
            if negate:
                ivals = _complement_ivals(ivals)
            return ("set", tuple(ivals))
        return self._simple()

    def _simple(self):
        c = self._peek()
        if c == ".":
            self._next()
            return ("set", ((0, MAX_CP - 1),))
        if c == "#":
            self._next()
            return ("none",)
        if c == "@":
            self._next()
            return ("any*",)
        if c == '"':
            self._next()
            node = ("eps",)
            while self._peek() != '"':
                cp = ord(self._next())
                node = ("cat", node, ("set", ((cp, cp),)))
            self._next()
            return node
        if c == "(":
            self._next()
            if self._peek() == ")":
                self._next()
                return ("eps",)
            node = self._union()
            if self._next() != ")":
                raise ValueError("expected )")
            return node
        if c == "<":
            self._next()
            body = ""
            while self._peek() != ">":
                body += self._next()
            self._next()
            lo_s, sep, hi_s = body.partition("-")
            if not sep or not lo_s.isdigit() or not hi_s.isdigit():
                raise ValueError(
                    f"named automata (<{body}>) are not supported; only "
                    "numeric intervals <n-m>")
            # RegExp.parseInterval: equal-length operands fix the digit
            # count (leading zeros significant), otherwise any
            # no-leading-zero representation matches
            digits = len(lo_s) if len(lo_s) == len(hi_s) else 0
            lo, hi = int(lo_s), int(hi_s)
            if lo > hi:
                lo, hi = hi, lo
            return _interval_ast(lo, hi, digits)
        cp = self._charexp_cp()
        return ("set", ((cp, cp),))

    def _charexp_cp(self) -> int:
        c = self._next()
        if c == "\\":
            return ord(self._next())  # backslash quotes any char
        return ord(c)


def _merge(ivals):
    out = []
    for lo, hi in sorted(ivals):
        if out and lo <= out[-1][1] + 1:
            out[-1] = (out[-1][0], max(out[-1][1], hi))
        else:
            out.append((lo, hi))
    return out


def _complement_ivals(ivals):
    out, prev = [], 0
    for lo, hi in ivals:
        if lo > prev:
            out.append((prev, lo - 1))
        prev = hi + 1
    if prev < MAX_CP:
        out.append((prev, MAX_CP - 1))
    return out


_DIGIT = lambda lo, hi: ("set", ((ord("0") + lo, ord("0") + hi),))  # noqa: E731


def _fixed_interval_ast(lo: int, hi: int, d: int):
    """AST matching exactly-d-digit strings whose value is in
    [lo, hi] (lo, hi both d digits wide, leading zeros allowed)."""
    slo, shi = str(lo).zfill(d), str(hi).zfill(d)
    if d == 1:
        return _DIGIT(lo, hi)
    if slo[0] == shi[0]:
        return ("cat", ("set", ((ord(slo[0]), ord(slo[0])),)),
                _fixed_interval_ast(int(slo[1:]), int(shi[1:]), d - 1))
    parts = []
    # low branch: first digit of slo, rest >= slo[1:]
    parts.append(("cat", ("set", ((ord(slo[0]), ord(slo[0])),)),
                  _fixed_interval_ast(int(slo[1:]), 10 ** (d - 1) - 1,
                                      d - 1)))
    # middle full-range first digits
    if ord(shi[0]) - ord(slo[0]) > 1:
        mid = ("set", ((ord(slo[0]) + 1, ord(shi[0]) - 1),))
        any_rest = _fixed_interval_ast(0, 10 ** (d - 1) - 1, d - 1)
        parts.append(("cat", mid, any_rest))
    # high branch
    parts.append(("cat", ("set", ((ord(shi[0]), ord(shi[0])),)),
                  _fixed_interval_ast(0, int(shi[1:]), d - 1)))
    node = parts[0]
    for p in parts[1:]:
        node = ("or", node, p)
    return node


def _interval_ast(lo: int, hi: int, digits: int):
    """brics Automata.makeInterval analog: digits>0 → exact-width match
    with leading zeros; digits=0 → canonical (no-leading-zero)
    representations of any width."""
    if digits > 0:
        if hi >= 10 ** digits:
            raise ValueError("interval bound wider than its digit count")
        return _fixed_interval_ast(lo, hi, digits)
    node = None
    for d in range(len(str(lo)), len(str(hi)) + 1):
        d_lo = max(lo, 0 if d == 1 else 10 ** (d - 1))
        d_hi = min(hi, 10 ** d - 1)
        if d_lo > d_hi:
            continue
        part = _fixed_interval_ast(d_lo, d_hi, d)
        node = part if node is None else ("or", node, part)
    return node if node is not None else ("none",)


# --------------------------------------------------------------------
# Alphabet compression: partition the unicode range into equivalence
# classes at the interval boundaries the ASTs actually use, so
# automaton transitions index a few dozen classes instead of 0x110000
# codepoints.
# --------------------------------------------------------------------


def _collect_bounds(node, acc):
    t = node[0]
    if t == "set":
        for lo, hi in node[1]:
            acc.add(lo)
            acc.add(hi + 1)
    elif t in ("cat", "or", "and"):
        _collect_bounds(node[1], acc)
        _collect_bounds(node[2], acc)
    elif t in ("not", "star", "plus", "opt"):
        _collect_bounds(node[1], acc)
    elif t == "rep":
        _collect_bounds(node[1], acc)


class _Alphabet:
    def __init__(self, asts):
        acc = {0, MAX_CP}
        for a in asts:
            _collect_bounds(a, acc)
        self.bounds = np.array(sorted(acc), dtype=np.int64)
        self.n_classes = len(self.bounds) - 1

    def classes_of(self, ivals) -> frozenset:
        out = set()
        for lo, hi in ivals:
            first = int(np.searchsorted(self.bounds, lo, side="right")) - 1
            last = int(np.searchsorted(self.bounds, hi, side="right")) - 1
            out.update(range(first, last + 1))
        return frozenset(out)


# --------------------------------------------------------------------
# NFA (Thompson construction over class indices) with embedded-DFA
# handling for the non-regular-composable operators ~ and &.
# --------------------------------------------------------------------


class _NFA:
    def __init__(self):
        self.trans = []  # state -> {class: set(states)}
        self.eps = []    # state -> set(states)

    def new_state(self) -> int:
        self.trans.append({})
        self.eps.append(set())
        return len(self.trans) - 1

    def add(self, s, cls, t):
        self.trans[s].setdefault(cls, set()).add(t)

    def add_eps(self, s, t):
        self.eps[s].add(t)


def _compile(nfa: _NFA, node, ab: _Alphabet):
    """Return (start, accept) state pair for ``node`` inside ``nfa``."""
    t = node[0]
    if t == "eps":
        s = nfa.new_state()
        return s, s
    if t == "none":
        return nfa.new_state(), nfa.new_state()  # accept unreachable
    if t == "set":
        s, a = nfa.new_state(), nfa.new_state()
        for cls in ab.classes_of(node[1]):
            nfa.add(s, cls, a)
        return s, a
    if t == "any*":
        s = nfa.new_state()
        for cls in range(ab.n_classes):
            nfa.add(s, cls, s)
        return s, s
    if t == "cat":
        s1, a1 = _compile(nfa, node[1], ab)
        s2, a2 = _compile(nfa, node[2], ab)
        nfa.add_eps(a1, s2)
        return s1, a2
    if t == "or":
        s, a = nfa.new_state(), nfa.new_state()
        for child in (node[1], node[2]):
            cs, ca = _compile(nfa, child, ab)
            nfa.add_eps(s, cs)
            nfa.add_eps(ca, a)
        return s, a
    if t == "star" or t == "plus":
        cs, ca = _compile(nfa, node[1], ab)
        s, a = nfa.new_state(), nfa.new_state()
        nfa.add_eps(s, cs)
        nfa.add_eps(ca, a)
        nfa.add_eps(ca, cs)
        if t == "star":
            nfa.add_eps(s, a)
        return s, a
    if t == "opt":
        cs, ca = _compile(nfa, node[1], ab)
        s, a = nfa.new_state(), nfa.new_state()
        nfa.add_eps(s, cs)
        nfa.add_eps(ca, a)
        nfa.add_eps(s, a)
        return s, a
    if t == "rep":
        _, _, n, m = node
        child = node[1]
        s = nfa.new_state()
        cur = s
        for _ in range(n):
            cs, ca = _compile(nfa, child, ab)
            nfa.add_eps(cur, cs)
            cur = ca
        if m is None:
            cs, ca = _compile(nfa, child, ab)
            nfa.add_eps(cur, cs)
            nfa.add_eps(ca, cs)
            a = nfa.new_state()
            nfa.add_eps(cur, a)  # zero extra reps
            nfa.add_eps(ca, a)
            return s, a
        a = nfa.new_state()
        nfa.add_eps(cur, a)
        for _ in range(m - n):
            cs, ca = _compile(nfa, child, ab)
            nfa.add_eps(cur, cs)
            cur = ca
            nfa.add_eps(cur, a)
        return s, a
    if t == "not" or t == "and":
        # not regular-composable on NFAs: determinize operand(s),
        # complement / product on the total DFA, re-embed as NFA states
        if t == "not":
            sub = _NFA()
            ss, sa = _compile(sub, node[1], ab)
            trans, accept = _determinize_simple(sub, ss, {sa}, ab)
            accept = ~accept
        else:
            d = []
            for child in (node[1], node[2]):
                sub = _NFA()
                ss, sa = _compile(sub, child, ab)
                d.append(_determinize_simple(sub, ss, {sa}, ab))
            trans, accept = _dfa_product(d[0], d[1], ab)
        n_states = trans.shape[0]
        base = [nfa.new_state() for _ in range(n_states)]
        for st in range(n_states):
            for cls in range(ab.n_classes):
                nfa.add(base[st], cls, base[int(trans[st, cls])])
        a = nfa.new_state()
        for st in range(n_states):
            if accept[st]:
                nfa.add_eps(base[st], a)
        return base[0], a
    raise ValueError(f"unknown AST node {t}")


def _eps_closure(nfa: _NFA, states) -> frozenset:
    stack, seen = list(states), set(states)
    while stack:
        s = stack.pop()
        for t in nfa.eps[s]:
            if t not in seen:
                seen.add(t)
                stack.append(t)
    return frozenset(seen)


def _determinize_simple(nfa: _NFA, start: int, accepts: set,
                        ab: _Alphabet):
    """Subset construction → TOTAL dfa (trans matrix incl. dead state,
    accept bool array)."""
    trans_rows, accept_flags = [], []
    index = {}

    def intern(subset):
        if subset not in index:
            index[subset] = len(trans_rows)
            trans_rows.append(None)
            accept_flags.append(bool(subset & accepts))
            if len(trans_rows) > MAX_DFA_STATES:
                raise ValueError("DFA state blowup (rule too complex)")
            work.append(subset)
        return index[subset]

    work = []
    start_set = _eps_closure(nfa, {start})
    intern(start_set)
    wi = 0
    while wi < len(work):
        subset = work[wi]
        wi += 1
        row = np.zeros(ab.n_classes, dtype=np.int32)
        for cls in range(ab.n_classes):
            nxt = set()
            for s in subset:
                nxt.update(nfa.trans[s].get(cls, ()))
            row[cls] = intern(_eps_closure(nfa, nxt) if nxt
                              else frozenset())
        trans_rows[index[subset]] = row
    return (np.vstack(trans_rows),
            np.array(accept_flags, dtype=bool))


def _dfa_product(d1, d2, ab: _Alphabet):
    t1, a1 = d1
    t2, a2 = d2
    n2 = t2.shape[0]
    # product state (i, j) -> i * n2 + j, fully vectorized
    n1 = t1.shape[0]
    i = np.repeat(np.arange(n1), n2)
    j = np.tile(np.arange(n2), n1)
    trans = t1[i] * n2 + t2[j]
    accept = a1[i] & a2[j]
    return trans.astype(np.int32), accept


class RuleSetAutomaton:
    """All rules of one filter file as a single first-match-wins DFA.

    ``match_first(urls)`` returns, per url, the index of the first
    rule whose automaton accepts the FULL url, or -1 — one table walk
    per url regardless of rule count (the subset construction carries
    every rule's accept marker; a DFA state's label is the minimum
    rule index present, which IS first-match-wins)."""

    def __init__(self, patterns):
        asts = [_Parser(p).parse() for p in patterns]
        ab = _Alphabet(asts)
        nfa = _NFA()
        start = nfa.new_state()
        accept_label = {}
        for idx, ast in enumerate(asts):
            s, a = _compile(nfa, ast, ab)
            nfa.add_eps(start, s)
            # keep the SMALLEST rule index if several rules share a
            # state (cannot happen here — accepts are per-fragment)
            accept_label[a] = min(accept_label.get(a, idx), idx)

        trans_rows, labels = [], []
        index = {}
        work = []

        def intern(subset):
            if subset not in index:
                index[subset] = len(trans_rows)
                trans_rows.append(None)
                labs = [accept_label[s] for s in subset
                        if s in accept_label]
                labels.append(min(labs) if labs else -1)
                if len(trans_rows) > MAX_DFA_STATES:
                    raise ValueError("DFA state blowup (rules too complex)")
                work.append(subset)
            return index[subset]

        intern(_eps_closure(nfa, {start}))
        wi = 0
        while wi < len(work):
            subset = work[wi]
            wi += 1
            row = np.zeros(ab.n_classes, dtype=np.int32)
            for cls in range(ab.n_classes):
                nxt = set()
                for s in subset:
                    nxt.update(nfa.trans[s].get(cls, ()))
                row[cls] = intern(_eps_closure(nfa, nxt) if nxt
                                  else frozenset())
            trans_rows[index[subset]] = row
        self._trans = np.vstack(trans_rows)
        self._labels = np.array(labels, dtype=np.int32)
        self._bounds = ab.bounds
        self.n_states = self._trans.shape[0]

    def match_first(self, urls) -> np.ndarray:
        """Vectorized: first-matching rule index per url, -1 if none
        (None urls are -1). One gathered transition per character
        position for the whole batch."""
        n = len(urls)
        out = np.full(n, -1, dtype=np.int32)
        if n == 0:
            return out
        lens = np.fromiter(
            (len(u) if u is not None else -1 for u in urls),
            dtype=np.int64, count=n)
        valid = lens >= 0
        maxlen = int(lens.max()) if valid.any() else 0
        state = np.zeros(n, dtype=np.int32)
        if maxlen > 0:
            mat = np.zeros((n, maxlen), dtype=np.int64)
            for i, u in enumerate(urls):
                if u:
                    mat[i, :len(u)] = np.frombuffer(
                        u.encode("utf-32-le"), dtype=np.uint32)
            cls = (np.searchsorted(self._bounds, mat, side="right") - 1
                   ).astype(np.int32)
            trans = self._trans
            for p in range(maxlen):
                live = lens > p
                if not live.any():
                    break
                state[live] = trans[state[live], cls[live, p]]
        out[valid] = self._labels[state[valid]]
        return out


class AutomatonURLFilter:
    """±rule chain over brics-syntax automata
    (AutomatonURLFilter.java:43-105 + RegexURLFilterBase.java:144-152).
    """

    def __init__(self, rules):
        rules = list(rules)
        self._signs = [sign for sign, _ in rules]
        self._auto = RuleSetAutomaton([pat for _, pat in rules])

    def accepts(self, url: str) -> bool:
        idx = int(self._auto.match_first([url])[0])
        return idx >= 0 and self._signs[idx] == "+"

    def verdicts(self, urls) -> np.ndarray:
        """Vectorized ``+``/``-`` per url (URLFilterChecker dump)."""
        idx = self._auto.match_first(urls)
        plus = np.array([s == "+" for s in self._signs] + [False],
                        dtype=bool)
        return np.where(plus[idx], "+", "-")

    @classmethod
    def from_lines(cls, lines) -> "AutomatonURLFilter":
        """Same ±rule file format as the regex family
        (RegexURLFilterBase.readRules)."""
        rules = []
        for line in lines:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            sign, pattern = line[0], line[1:]
            if sign not in "+-":
                raise ValueError(f"Invalid first character in rule: {line}")
            rules.append((sign, pattern))
        return cls(rules)


@lru_cache(maxsize=8)
def compiled_filter(rules_key) -> AutomatonURLFilter:
    """Per-executor-process compile cache (rules tuple → filter)."""
    return AutomatonURLFilter(rules_key)
