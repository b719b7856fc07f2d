from . import control  # noqa: F401

# Qt widget modules (gui_design, gui_draw, gui_gamut, gui_palette, gui_vis)
# import PyQt5 lazily — import them directly where a display exists.
