"""Host-side IO: TUM dataset loading/association, trajectory writing,
synthetic RGB-D scene generation."""
