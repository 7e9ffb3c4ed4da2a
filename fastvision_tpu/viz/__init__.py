"""Visualization: box drawing and class colors."""
from .draw import draw_box_label, draw_detections, get_color
