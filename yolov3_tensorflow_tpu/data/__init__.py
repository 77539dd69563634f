"""Host-side data pipeline: annotation parsing, augmentation, label encoding,
threaded device-feeding loader."""
