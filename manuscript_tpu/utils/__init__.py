from .visualize import draw_quads, visualize_page
