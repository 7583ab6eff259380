"""Evaluation: image/depth/normal/point-cloud/mesh metrics + runners."""
