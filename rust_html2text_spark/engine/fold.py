"""Non-recursive tree fold (explicit stack), so deeply nested DOMs cannot
overflow the Python stack.  Re-derives `tree_map_reduce`
(/root/reference/src/lib.rs:1371-1448)."""

from __future__ import annotations

FINISHED = 0
PENDING = 1
NOTHING = 2


class Pending:
    __slots__ = ("children", "cons", "prefn", "postfn")

    def __init__(self, children, cons, prefn=None, postfn=None):
        self.children = children
        self.cons = cons
        self.prefn = prefn
        self.postfn = postfn


class Finished:
    __slots__ = ("result",)

    def __init__(self, result):
        self.result = result


NOTHING_SENTINEL = object()


class _Frame:
    __slots__ = ("construct", "prefn", "postfn", "children", "to_process")

    def __init__(self, construct, prefn, postfn, to_process):
        self.construct = construct
        self.prefn = prefn
        self.postfn = postfn
        self.children = []
        self.to_process = to_process


def tree_map_reduce(context, top, process_node):
    """process_node(context, node) -> Finished | Pending | None (= Nothing).

    A `cons` callback returns NOTHING_SENTINEL to produce no result (the
    Rust `Ok(None)`); any other return value — including Python None — is a
    real result appended to the parent (the Rust `Ok(Some(r))`, where `r`
    itself may be an Option).
    """
    last = _Frame(lambda ctx, cs: cs.pop() if cs else NOTHING_SENTINEL, None, None, iter([top]))
    pending_stack = []
    finished_cls = Finished  # local binds: this loop runs per DOM/render node
    while True:
        prefn = last.prefn
        postfn = last.postfn
        children = last.children
        for h in last.to_process:
            if prefn is not None:
                prefn(context, h)
            res = process_node(context, h)
            if res is None:
                continue
            if res.__class__ is finished_cls:
                r = res.result
                if postfn is not None:
                    postfn(context, r)
                children.append(r)
            else:
                pending_stack.append(last)
                last = _Frame(res.cons, res.prefn, res.postfn, iter(res.children))
                break
        else:
            if pending_stack:
                parent = pending_stack.pop()
                node = last.construct(context, children)
                if node is not NOTHING_SENTINEL:
                    if parent.postfn is not None:
                        parent.postfn(context, node)
                    parent.children.append(node)
                last = parent
                continue
            result = last.construct(context, children)
            return None if result is NOTHING_SENTINEL else result
