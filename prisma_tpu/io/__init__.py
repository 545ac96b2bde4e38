"""Host-side media IO: images, video (native libav codec), .flo/.ply/.csv writers."""
