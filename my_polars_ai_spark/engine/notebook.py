"""Jupyter integration (parity with reference helpers/notebook.py:13-49):
detect a notebook frontend and inject generated code into a new cell."""

from __future__ import annotations


def is_notebook() -> bool:
    try:
        from IPython import get_ipython  # type: ignore

        shell = get_ipython()
        if shell is None:
            return False
        return shell.__class__.__name__ == "ZMQInteractiveShell"
    except ImportError:
        return False


def show_code_in_new_cell(code: str) -> bool:
    """Open a new notebook cell pre-filled with ``code``; returns False
    outside a notebook (callers fall back to printing)."""
    if not is_notebook():
        return False
    from IPython import get_ipython  # type: ignore

    get_ipython().set_next_input(code)
    return True
