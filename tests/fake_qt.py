"""Minimal PySide6 API double for headless GUI execution tests.

PySide6 is absent in the TPU dev image, so `person_capture_tpu.gui_app`
could only ever be compile-checked. This module emulates exactly the Qt
surface the GUI uses — widgets as value holders, signals as synchronous
callback lists, QSettings as an in-process store — so tests can CONSTRUCT
MainWindow, drive its controls, run a real Engine through the window's
start path, and exercise live-push/preset/persistence logic. It is not Qt:
no event loop, no rendering, synchronous signal delivery.
"""

from __future__ import annotations

import types


# --------------------------------------------------------------- signals


class BoundSignal:
    def __init__(self):
        self._subs = []

    def connect(self, fn):
        self._subs.append(fn)

    def emit(self, *args):
        for fn in list(self._subs):
            fn(*args)


class Signal:
    """Class-level descriptor → per-instance BoundSignal."""

    _count = 0

    def __init__(self, *types_):
        Signal._count += 1
        self._key = f"__signal_{Signal._count}"

    def __get__(self, obj, owner=None):
        if obj is None:
            return self
        sig = obj.__dict__.get(self._key)
        if sig is None:
            sig = BoundSignal()
            obj.__dict__[self._key] = sig
        return sig


# --------------------------------------------------------------- QtCore


class QObject:
    def __init__(self, *a, **k):
        pass


class _QtNamespace:
    AlignCenter = 0x84
    Horizontal = 1
    KeepAspectRatio = 1
    SmoothTransformation = 1
    QueuedConnection = 2


class QSettings:
    _stores: dict = {}

    def __init__(self, org, app):
        self._s = QSettings._stores.setdefault((org, app), {})

    def value(self, key, default=None):
        return self._s.get(key, default)

    def setValue(self, key, value):
        self._s[key] = value


class QMetaObject:
    @staticmethod
    def invokeMethod(obj, name, _conn=None, *args):
        vals = [a.value for a in args]
        return getattr(obj, name)(*vals)


class _QArg:
    def __init__(self, typ, value):
        self.value = value


def Q_ARG(typ, value):
    return _QArg(typ, value)


# --------------------------------------------------------------- QtGui


class QImage:
    Format_RGB888 = 13

    def __init__(self, data=None, w=0, h=0, stride=0, fmt=0):
        self.w, self.h = int(w), int(h)

    def copy(self):
        return self


class QPixmap:
    def __init__(self, img=None):
        self.img = img

    @staticmethod
    def fromImage(img):
        return QPixmap(img)

    def scaled(self, *a, **k):
        return self


# --------------------------------------------------------------- widgets


class _Widget:
    def __init__(self, *a, **k):
        self._visible = True
        self._tooltip = ""

    def setVisible(self, on):
        self._visible = bool(on)

    def setToolTip(self, text):
        self._tooltip = str(text)

    def setMaximumHeight(self, h):
        pass

    def setMinimumSize(self, w, h):
        pass

    def setAlignment(self, a):
        pass

    def size(self):
        return (480, 270)

    def show(self):
        pass

    def resize(self, w, h):
        pass


class QWidget(_Widget):
    def __init__(self, *a, **k):
        super().__init__()
        self._layout = None

    def setLayout(self, lay):
        self._layout = lay

    def layout(self):
        return self._layout


class _LayoutItem:
    def __init__(self, w):
        self._w = w

    def widget(self):
        return self._w


class _Layout:
    def __init__(self, parent=None):
        self._items = []
        if parent is not None and hasattr(parent, "setLayout"):
            parent.setLayout(self)

    def addWidget(self, w, *a):
        self._items.append(_LayoutItem(w))

    def addLayout(self, lay, *a):
        self._items.append(_LayoutItem(None))

    def addStretch(self, *a):
        pass

    def count(self):
        return len(self._items)

    def itemAt(self, i):
        return self._items[i] if 0 <= i < len(self._items) else None


class QHBoxLayout(_Layout):
    pass


class QVBoxLayout(_Layout):
    pass


class QFormLayout(_Layout):
    def addRow(self, label, widget=None):
        target = widget if widget is not None else label
        if isinstance(target, _Layout):
            self._items.append(_LayoutItem(None))
        else:
            self._items.append(_LayoutItem(target))


class QLineEdit(_Widget):
    def __init__(self, text=""):
        super().__init__()
        self._text = str(text)
        self.editingFinished = BoundSignal()

    def text(self):
        return self._text

    def setText(self, t):
        self._text = str(t)
        self.editingFinished.emit()


class QPushButton(_Widget):
    def __init__(self, label=""):
        super().__init__()
        self.label = label
        self.clicked = BoundSignal()
        self.toggled = BoundSignal()
        self._checked = False

    def setCheckable(self, on):
        pass

    def click(self):
        self.clicked.emit()

    def toggle(self, value):
        self._checked = bool(value)
        self.toggled.emit(self._checked)


class QCheckBox(_Widget):
    def __init__(self, label=""):
        super().__init__()
        self._checked = False
        self.toggled = BoundSignal()

    def setChecked(self, v):
        self._checked = bool(v)
        self.toggled.emit(self._checked)

    def isChecked(self):
        return self._checked


class QSpinBox(_Widget):
    def __init__(self):
        super().__init__()
        self._v = 0
        self.valueChanged = BoundSignal()

    def setRange(self, lo, hi):
        pass

    def setSingleStep(self, s):
        pass

    def setValue(self, v):
        self._v = int(v)
        self.valueChanged.emit(self._v)

    def value(self):
        return self._v


class QDoubleSpinBox(QSpinBox):
    def setDecimals(self, n):
        pass

    def setValue(self, v):
        self._v = float(v)
        self.valueChanged.emit(self._v)


class QComboBox(_Widget):
    def __init__(self):
        super().__init__()
        self._items = []
        self._idx = 0

    def addItems(self, items):
        self._items.extend(items)

    def currentText(self):
        return self._items[self._idx] if self._items else ""

    def findText(self, t):
        return self._items.index(t) if t in self._items else -1

    def setCurrentIndex(self, i):
        self._idx = int(i)


class _ListItem:
    def __init__(self, text):
        self._t = str(text)

    def text(self):
        return self._t


class QListWidget(_Widget):
    def __init__(self):
        super().__init__()
        self._items = []

    def addItem(self, text):
        self._items.append(_ListItem(text))

    def count(self):
        return len(self._items)

    def item(self, i):
        return self._items[i]

    def currentRow(self):
        return len(self._items) - 1

    def takeItem(self, row):
        if 0 <= row < len(self._items):
            return self._items.pop(row)


class QPlainTextEdit(_Widget):
    def __init__(self):
        super().__init__()
        self.lines = []

    def setReadOnly(self, v):
        pass

    def setMaximumBlockCount(self, n):
        pass

    def appendPlainText(self, text):
        self.lines.append(str(text))


class QLabel(_Widget):
    def __init__(self, text=""):
        super().__init__()
        self._text = str(text)
        self._pixmap = None

    def setText(self, t):
        self._text = str(t)

    def text(self):
        return self._text

    def setPixmap(self, p):
        self._pixmap = p


class QProgressBar(_Widget):
    def __init__(self):
        super().__init__()
        self._v = 0

    def setRange(self, lo, hi):
        pass

    def setValue(self, v):
        self._v = int(v)

    def value(self):
        return self._v


class QSlider(_Widget):
    def __init__(self, orientation=None):
        super().__init__()
        self._v = 0
        self._range = (0, 0)
        self.sliderReleased = BoundSignal()

    def setRange(self, lo, hi):
        self._range = (lo, hi)

    def setValue(self, v):
        self._v = int(v)

    def value(self):
        return self._v

    def isSliderDown(self):
        return False


class QScrollArea(_Widget):
    def __init__(self):
        super().__init__()
        self._w = None

    def setWidgetResizable(self, v):
        pass

    def setWidget(self, w):
        self._w = w

    def widget(self):
        return self._w


class QGroupBox(QWidget):
    def __init__(self, title=""):
        super().__init__()
        self.title = title
        self.toggled = BoundSignal()

    def setCheckable(self, v):
        pass


class QTabWidget(_Widget):
    def __init__(self):
        super().__init__()
        self.tabs = []

    def addTab(self, w, label):
        self.tabs.append((label, w))


class _Action:
    def __init__(self, label):
        self.label = label
        self.triggered = BoundSignal()


class _Menu:
    def __init__(self, label):
        self.label = label
        self.actions = []

    def addAction(self, label):
        a = _Action(label)
        self.actions.append(a)
        return a


class _MenuBar:
    def __init__(self):
        self.menus = []

    def addMenu(self, label):
        m = _Menu(label)
        self.menus.append(m)
        return m


class QMainWindow(_Widget):
    def __init__(self):
        super().__init__()
        self._central = None
        self._menubar = _MenuBar()

    def setWindowTitle(self, t):
        pass

    def setCentralWidget(self, w):
        self._central = w

    def menuBar(self):
        return self._menubar

    def closeEvent(self, event):
        pass

    def close(self):
        self.closeEvent(types.SimpleNamespace(accept=lambda: None))


class QFileDialog:
    """Tests monkeypatch the static methods to feed paths."""

    @staticmethod
    def getOpenFileName(*a, **k):
        return "", ""

    @staticmethod
    def getOpenFileNames(*a, **k):
        return [], ""

    @staticmethod
    def getSaveFileName(*a, **k):
        return "", ""

    @staticmethod
    def getExistingDirectory(*a, **k):
        return ""


class QApplication:
    def __init__(self, argv):
        pass

    def exec(self):
        return 0


# --------------------------------------------------------------- modules


def install(monkeypatch=None):
    """Install fake PySide6 modules into sys.modules; returns the package
    module. With a pytest monkeypatch, installation auto-reverts."""
    import sys

    qtcore = types.ModuleType("PySide6.QtCore")
    qtcore.QObject = QObject
    qtcore.Signal = Signal
    qtcore.Qt = _QtNamespace
    qtcore.QSettings = QSettings
    qtcore.QMetaObject = QMetaObject
    qtcore.Q_ARG = Q_ARG

    qtgui = types.ModuleType("PySide6.QtGui")
    qtgui.QImage = QImage
    qtgui.QPixmap = QPixmap

    qtwidgets = types.ModuleType("PySide6.QtWidgets")
    for name, obj in globals().items():
        if name.startswith("Q"):
            setattr(qtwidgets, name, obj)

    pyside = types.ModuleType("PySide6")
    pyside.QtCore = qtcore
    pyside.QtGui = qtgui
    pyside.QtWidgets = qtwidgets

    mods = {"PySide6": pyside, "PySide6.QtCore": qtcore,
            "PySide6.QtGui": qtgui, "PySide6.QtWidgets": qtwidgets}
    if monkeypatch is not None:
        for k, v in mods.items():
            monkeypatch.setitem(sys.modules, k, v)
    else:
        sys.modules.update(mods)
    return pyside
