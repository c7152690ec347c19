"""PySide6 widget layer for the interactive GUI.

Behavioral parity target: reference gui/gui.py:18-485 (timeline slider,
object dial, visualization-mode combo, propagate fwd/bwd, commit, memory
gauges, console, import/export buttons) driving the headless MainController.

PySide6 is not installed in every environment — import this module lazily;
everything except this file works headless.
"""
from __future__ import annotations

import numpy as np

try:
    from PySide6.QtCore import Qt, QTimer
    from PySide6.QtGui import QImage, QPixmap
    from PySide6.QtWidgets import (QApplication, QComboBox, QHBoxLayout, QLabel,
                                   QMainWindow, QPlainTextEdit, QPushButton,
                                   QProgressBar, QSlider, QSpinBox, QVBoxLayout,
                                   QWidget, QFileDialog)
    HAS_QT = True
except ImportError as _e:  # pragma: no cover - environment without Qt
    HAS_QT = False
    _IMPORT_ERROR = _e


def require_qt():
    if not HAS_QT:
        raise RuntimeError(
            "PySide6 is required for the interactive GUI but is not installed "
            f"in this environment ({_IMPORT_ERROR}). The headless controller "
            "(cutie_tpu.gui.main_controller.MainController) exposes the same "
            "operations programmatically.")


if HAS_QT:

    class GUI(QMainWindow):
        """Main window; acts as the MainController's `view`."""

        def __init__(self, controller, cfg):
            super().__init__()
            self.controller = controller
            controller.view = self
            self.setWindowTitle("cutie_tpu interactive demo")

            self.canvas = QLabel()
            self.canvas.setMouseTracking(True)
            self.canvas.mousePressEvent = self._on_mouse_press

            self.timeline = QSlider(Qt.Horizontal)
            self.timeline.setMaximum(controller.T - 1)
            self.timeline.valueChanged.connect(
                lambda v: controller.load_frame(v))

            self.object_spin = QSpinBox()
            self.object_spin.setRange(1, controller.num_objects)
            self.object_spin.valueChanged.connect(self._set_object)

            self.vis_combo = QComboBox()
            for mode in ("davis", "fade", "light", "popup", "layer", "rgba",
                         "mask", "image"):
                self.vis_combo.addItem(mode)
            self.vis_combo.currentTextChanged.connect(controller.set_vis_mode)

            fwd = QPushButton("Propagate forward")
            fwd.clicked.connect(lambda: controller.on_propagate("forward"))
            bwd = QPushButton("Propagate backward")
            bwd.clicked.connect(lambda: controller.on_propagate("backward"))
            stop = QPushButton("Stop")
            stop.clicked.connect(controller.stop_propagation)
            commit = QPushButton("Commit to permanent memory")
            commit.clicked.connect(controller.on_commit)
            clear_mem = QPushButton("Clear memory")
            clear_mem.clicked.connect(controller.on_clear_memory)
            export = QPushButton("Export video")
            export.clicked.connect(lambda: controller.export_video())
            import_mask = QPushButton("Import mask")
            import_mask.clicked.connect(self._import_mask)
            import_layer = QPushButton("Import layer")
            import_layer.clicked.connect(self._import_layer)

            self.perm_gauge = QProgressBar()
            self.work_gauge = QProgressBar()
            self.lt_gauge = QProgressBar()
            self.console = QPlainTextEdit()
            self.console.setReadOnly(True)

            buttons = QHBoxLayout()
            for b in (fwd, bwd, stop, commit, clear_mem, export, import_mask,
                      import_layer):
                buttons.addWidget(b)
            controls = QHBoxLayout()
            controls.addWidget(QLabel("Object:"))
            controls.addWidget(self.object_spin)
            controls.addWidget(QLabel("Overlay:"))
            controls.addWidget(self.vis_combo)
            controls.addWidget(QLabel("perm/work/LT:"))
            controls.addWidget(self.perm_gauge)
            controls.addWidget(self.work_gauge)
            controls.addWidget(self.lt_gauge)

            layout = QVBoxLayout()
            layout.addWidget(self.canvas, stretch=1)
            layout.addWidget(self.timeline)
            layout.addLayout(controls)
            layout.addLayout(buttons)
            layout.addWidget(self.console)
            central = QWidget()
            central.setLayout(layout)
            self.setCentralWidget(central)
            self.refresh(controller)

        def _set_object(self, v):
            self.controller.curr_object = int(v)

        def _on_mouse_press(self, event):
            pos = event.position()
            x = int(pos.x() * self.controller.w / max(1, self.canvas.width()))
            y = int(pos.y() * self.controller.h / max(1, self.canvas.height()))
            is_neg = event.button() == Qt.RightButton
            self.controller.click(x, y, is_neg=is_neg)

        def refresh(self, controller):
            vis = controller.visualize()
            if vis.shape[-1] == 4:
                fmt = QImage.Format_RGBA8888
            else:
                fmt = QImage.Format_RGB888
            vis = np.ascontiguousarray(vis)
            qimg = QImage(vis.data, vis.shape[1], vis.shape[0],
                          vis.strides[0], fmt)
            self.canvas.setPixmap(QPixmap.fromImage(qimg).scaled(
                self.canvas.size(), Qt.KeepAspectRatio))
            self.timeline.blockSignals(True)
            self.timeline.setValue(controller.curr_ti)
            self.timeline.blockSignals(False)
            g = controller.get_memory_gauges()
            self.work_gauge.setMaximum(max(1, g["working_max"]))
            self.work_gauge.setValue(g["working"])
            self.lt_gauge.setMaximum(max(1, g["long_term_max"]))
            self.lt_gauge.setValue(g["long_term"])
            self.perm_gauge.setMaximum(max(1, g["permanent"]))
            self.perm_gauge.setValue(g["permanent"])
            QApplication.processEvents()

        def _import_mask(self):
            fn, _ = QFileDialog.getOpenFileName(self, "Import mask")
            if fn:
                self.controller.import_mask(fn)

        def _import_layer(self):
            fn, _ = QFileDialog.getOpenFileName(self, "Import layer")
            if fn:
                self.controller.import_layer(fn)
