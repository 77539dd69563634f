"""Host-side utilities: class names, anchors, weight import, viz, metering."""
