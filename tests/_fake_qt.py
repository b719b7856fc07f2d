"""Minimal PyQt5 stand-in so the real GUI logic runs headless in tests.

Provides exactly the names ideepcolor_tpu.ui.qt_gui imports. Widgets are
no-op containers; signals are real (connect/emit works); painters record
nothing. Install with ``install()`` before importing the GUI module.
"""
import sys
import types


class _BoundSignal:
    def __init__(self):
        self._slots = []

    def connect(self, fn):
        self._slots.append(fn)

    def emit(self, *args):
        for fn in list(self._slots):
            fn(*args)


class pyqtSignal:
    def __init__(self, *types_):
        self._name = None

    def __set_name__(self, owner, name):
        self._name = "__sig_" + name

    def __get__(self, obj, objtype=None):
        if obj is None:
            return self
        sig = obj.__dict__.get(self._name)
        if sig is None:
            sig = _BoundSignal()
            obj.__dict__[self._name] = sig
        return sig


class QPoint:
    def __init__(self, x=0, y=0):
        self._x, self._y = int(x), int(y)

    def x(self):
        return self._x

    def y(self):
        return self._y


class QSize:
    def __init__(self, w=0, h=0):
        self._w, self._h = w, h


class _Qt:
    LeftButton = 1
    RightButton = 2
    black = "black"
    white = "white"
    gray = "gray"
    Key_R, Key_Q, Key_S, Key_G, Key_L = range(82, 87)


Qt = _Qt()


class QColor:
    def __init__(self, r=0, g=0, b=0, a=255):
        self._rgb = (int(r), int(g), int(b))

    def red(self):
        return self._rgb[0]

    def green(self):
        return self._rgb[1]

    def blue(self):
        return self._rgb[2]

    def name(self):
        return "#%02x%02x%02x" % self._rgb


class QImage:
    Format_RGB888 = 13

    def __init__(self, *a, **k):
        pass


class QPen:
    def __init__(self, *a, **k):
        pass


class QPainter:
    def __init__(self, *a, **k):
        pass

    def __getattr__(self, name):
        return lambda *a, **k: None


class QWidget:
    def __init__(self, *a, **k):
        pass

    def setFixedSize(self, *a):
        pass

    def move(self, *a):
        pass

    def update(self, *a):
        pass

    def show(self):
        pass

    def setLayout(self, *a):
        pass


class QMainWindow(QWidget):
    def setCentralWidget(self, *a):
        pass

    def setWindowTitle(self, *a):
        pass


class _Layout:
    def __init__(self, *a, **k):
        pass

    def addWidget(self, *a, **k):
        pass

    def addLayout(self, *a, **k):
        pass


QHBoxLayout = QVBoxLayout = QGridLayout = _Layout


class QGroupBox(QWidget):
    def __init__(self, *a, **k):
        pass


class _Button(QWidget):
    def __init__(self, *a, **k):
        self.clicked = _BoundSignal()
        self.toggled = _BoundSignal()
        self._checked = False

    def setChecked(self, v):
        self._checked = v

    def toggle(self):
        self._checked = not self._checked
        self.toggled.emit(self._checked)


QPushButton = QCheckBox = _Button


class QFileDialog:
    @staticmethod
    def getOpenFileName(*a, **k):
        return "", ""


class QApplication:
    def __init__(self, *a):
        pass

    @staticmethod
    def quit():
        pass

    def exec_(self):
        return 0


class QTimer:
    """Synchronous stand-in: singleShot fires the callback immediately
    (the real Qt would run it on the next event-loop cycle)."""

    @staticmethod
    def singleShot(ms, fn):
        fn()


class _Event:
    """Fake mouse event."""

    def __init__(self, x, y, button=Qt.LeftButton, delta=0):
        self._pos = QPoint(x, y)
        self._button = button
        self._delta = delta

    def pos(self):
        return self._pos

    def button(self):
        return self._button

    def angleDelta(self):
        class _D:
            def __init__(self, d):
                self._d = d

            def y(self):
                return self._d
        return _D(self._delta)


def install():
    """Register the fake PyQt5 modules in sys.modules."""
    qtcore = types.ModuleType("PyQt5.QtCore")
    qtcore.Qt = Qt
    qtcore.QPoint = QPoint
    qtcore.QSize = QSize
    qtcore.QTimer = QTimer
    qtcore.pyqtSignal = pyqtSignal
    qtgui = types.ModuleType("PyQt5.QtGui")
    qtgui.QColor = QColor
    qtgui.QImage = QImage
    qtgui.QPainter = QPainter
    qtgui.QPen = QPen
    qtwidgets = types.ModuleType("PyQt5.QtWidgets")
    for n in ("QApplication", "QCheckBox", "QFileDialog", "QGroupBox",
              "QHBoxLayout", "QMainWindow", "QPushButton", "QVBoxLayout",
              "QWidget"):
        setattr(qtwidgets, n, globals()[n])
    pyqt5 = types.ModuleType("PyQt5")
    pyqt5.QtCore, pyqt5.QtGui, pyqt5.QtWidgets = qtcore, qtgui, qtwidgets
    sys.modules["PyQt5"] = pyqt5
    sys.modules["PyQt5.QtCore"] = qtcore
    sys.modules["PyQt5.QtGui"] = qtgui
    sys.modules["PyQt5.QtWidgets"] = qtwidgets
