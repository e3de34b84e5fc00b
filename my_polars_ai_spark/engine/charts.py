"""Chart persistence: rewrite generated code so every plt.show() is
preceded by plt.savefig(<exports/charts/{prompt_id}/chart*.png>).

Parity with the reference's save_chart AST pass (reference
helpers/save_chart.py:52-116). Charts always render driver-side from
collected/aggregated data — the distributed plan ends before matplotlib.
"""

from __future__ import annotations

import ast
import os


def add_save_chart(code: str, prompt_id: str, save_dir: str = "exports/charts") -> str:
    """Insert plt.savefig(...) before each plt.show() call; returns the
    rewritten source. No-op if the code never calls plt.show()."""
    tree = ast.parse(code)

    chart_dir = os.path.join(save_dir, prompt_id)
    counter = 0

    class _Rewriter(ast.NodeTransformer):
        def visit_Expr(self, node: ast.Expr):
            nonlocal counter
            call = node.value
            if (
                isinstance(call, ast.Call)
                and isinstance(call.func, ast.Attribute)
                and call.func.attr == "show"
                and isinstance(call.func.value, ast.Name)
                and call.func.value.id == "plt"
            ):
                suffix = "" if counter == 0 else f"_{counter}"
                counter += 1
                path = os.path.join(chart_dir, f"chart{suffix}.png")
                save = ast.parse(f"plt.savefig({path!r}, bbox_inches='tight')").body[0]
                return [save, node]
            return node

    new_tree = _Rewriter().visit(tree)
    ast.fix_missing_locations(new_tree)
    if counter:
        os.makedirs(chart_dir, exist_ok=True)
    return ast.unparse(new_tree)
