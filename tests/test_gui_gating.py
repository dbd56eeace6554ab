import pytest


def test_gui_import_gated():
    """Without PySide6, the GUI module raises a clear ImportError pointing
    at the CLI; with it, import succeeds."""
    try:
        import PySide6  # noqa: F401
        has_qt = True
    except ImportError:
        has_qt = False

    if has_qt:
        import person_capture_tpu.gui_app  # noqa: F401
    else:
        with pytest.raises(ImportError, match="PySide6"):
            import person_capture_tpu.gui_app  # noqa: F401
